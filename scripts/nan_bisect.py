import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
ensure_tpu()
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend())
from decnet_tpu.config import Config, ModelConfig
from decnet_tpu.models import get_model
from decnet_tpu.train.state import create_train_state
from decnet_tpu.train.step import make_train_step
from decnet_tpu.data.synthetic import make_pair
from decnet_tpu.data import io as dio
from decnet_tpu.data.masks import detail_masks_np

rng = np.random.RandomState(0)
H,W,D = 162,243,108
pairs = [make_pair(np.random.RandomState(i), H, W, D) for i in range(4)]
left = np.stack([dio.normalize_image(p["left"]/255.) for p in pairs])
right = np.stack([dio.normalize_image(p["right"]/255.) for p in pairs])
gt = np.stack([p["gt"] for p in pairs])
lm = [np.stack(x) for x in zip(*[detail_masks_np(p["left"]/255.) for p in pairs])]
rm = [np.stack(x) for x in zip(*[detail_masks_np(p["right"]/255.) for p in pairs])]
batch = {"left":left, "right":right, "gt":gt, "left_masks":lm, "right_masks":rm}

for dtype in ("float32","bfloat16"):
    for impl in ("xla","pallas"):
        cfg = Config(); cfg.model = ModelConfig(max_disp=D, base_channels=8, num_stage=4,
            down_scale=3, use_detail=True, thold=0.9, dtype=dtype, matching_impl=impl)
        cfg.train.lr=3e-4; cfg.train.total_steps=100; cfg.train.warmup_steps=5
        model = get_model("decnet", cfg.model)
        variables = model.init(jax.random.PRNGKey(0), left[:1], right[:1])
        # forward check
        out = model.apply(variables, left, right, train=True, mutable=["batch_stats"])[0]
        fin = {k: all(bool(np.isfinite(np.asarray(v)).all()) for v in vs) for k,vs in out.items() if vs}
        bad = [k for k,v in fin.items() if not v]
        print(f"dtype={dtype} impl={impl} fwd bad={bad}", flush=True)
        # 3 train steps
        state = create_train_state(model, variables, cfg.train)
        ts = make_train_step(model, cfg, donate=False)
        for i in range(3):
            state, logs = ts(state, batch)
        print(f"   loss after 3 steps: {float(logs['total']):.4f} grad_norm {float(logs['grad_norm']):.4f}", flush=True)
