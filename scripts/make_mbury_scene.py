"""Build a Middlebury-scale demo scene for the skip_stage_id=3 escape hatch.

The reference ships only calib.txt for InputData/Middlebury/Classroom2 (the
2880x1988 images are download-only), so this synthesises a full-resolution
scene by 3x-upscaling the shipped SceneFlow pair (InputData/Sceneflow/0006):
2880x1620 images whose true disparities are 3x the originals, with a matching
calib.txt ndisp.  The demo CLI then exercises exactly the reference's
huge-image path (demo.sh:5: --skip_stage_id=3, per-scene ndisp from calib,
x27 padding at 2880x1620).

Usage: python scripts/make_mbury_scene.py [--out /tmp/mbury_scene]
"""
import sys, os, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cv2

p = argparse.ArgumentParser()
p.add_argument("--out", default="/tmp/mbury_scene")
p.add_argument("--src", default="/root/reference/InputData/Sceneflow/0006")
p.add_argument("--scale", type=int, default=3)
p.add_argument("--ndisp", type=int, default=162)   # 54 * 3
args = p.parse_args()

scene = os.path.join(args.out, "upscaled0006")
os.makedirs(scene, exist_ok=True)
for name in ("im0.png", "im1.png"):
    img = cv2.imread(os.path.join(args.src, name))
    assert img is not None, os.path.join(args.src, name)
    h, w = img.shape[:2]
    up = cv2.resize(img, (w * args.scale, h * args.scale),
                    interpolation=cv2.INTER_CUBIC)
    cv2.imwrite(os.path.join(scene, name), up)
with open(os.path.join(scene, "calib.txt"), "w") as f:
    f.write(f"width={960 * args.scale}\nheight={540 * args.scale}\n"
            f"ndisp={args.ndisp}\n")
print(f"wrote {scene}: {960 * args.scale}x{540 * args.scale}, "
      f"ndisp={args.ndisp}")
