"""DecNet-TPU: a TPU-native stereo-depth framework.

A from-scratch JAX/XLA/Pallas re-design of the DecNet decomposition model for
stereo matching (CVPR 2021; reference implementation YaoChengTang/DecNet):
dense cost-volume matching at the coarsest pyramid scale, sparse
detail-restricted matching + sparse/dense fusion and refinement at finer
scales.  Compute path: XLA for dense ops, Pallas kernels for the banded
sparse-matching attention; scaling via jax.sharding over a
(data, tile, disp) device mesh.
"""

__version__ = "0.1.0"
