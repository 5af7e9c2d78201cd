"""codd_tpu — a TPU-native framework for temporally consistent online stereo video depth.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/CODD (WACV 2023, arXiv 2111.09337): per-frame cascaded
stereo (HITNet-style tile hypotheses), dense-SE(3) scene-flow motion
(RAFT-3D-style Gauss-Newton on a lie group), and recurrent fusion over a
fixed-shape cross-frame memory carry.

Design stance (vs. the CUDA/torch reference):
  * one jitted per-frame step ``step(params, carry, frame) -> (carry, out)``
    with a static-shape carry; sequences stream through ``jax.lax.scan``
    or an online per-frame call — no mutable python state dicts.
  * NHWC activations everywhere (TPU conv-native layout).
  * the reference's CUDA kernels (lietorch_extras GN system build,
    cholesky6x6, corr lookup; pytorch3d point splatting) are re-designed
    as batched-XLA formulations (MXU matmuls + segment ops) with Pallas
    kernels for the hot paths.
  * data parallelism via jax.sharding Mesh + NamedSharding, not NCCL.
"""

__version__ = "0.1.0"
