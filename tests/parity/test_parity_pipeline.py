"""Golden parity: the ASSEMBLED per-frame cascade vs the reference.

Runs the reference `ConsistentOnlineDynamicDepth` (torch, via mm_shim's
mmcv/lietorch/lietorch_extras/pytorch3d facades + the vendored HRNet
oracle) on a 2-frame clip and compares against `CODD.first_step` +
`CODD.step` with ported weights.  This certifies the one seam module-level
parity could not (VERDICT r3 missing #4): the cross-frame memory
write/read cycle (reference fusion.py:357-410), Motion's dual-res
transform_and_project splats (motion.py:82-130,183-207), and the
stereo -> motion -> fusion dispatch order (codd.py:80-126).

Our side runs `pixel_center_offset=-0.5` (pytorch3d's half-integer screen
convention), `warp_image=True` is NOT needed (the memory img slot is never
read downstream), and `splat_impl="xla"` batch-vmapped on CPU.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import mm_shim  # noqa: E402

mm_shim.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from codd_tpu.models.codd import CODD  # noqa: E402
from codd_tpu.utils.port_weights import port_codd_checkpoint  # noqa: E402

MAX_DISP = 64
ITERS = 2
B, H, W = 1, 128, 128


def _build_reference():
    # imports register the modules with the shimmed mmseg registry
    import model.stereo.hitnet.hitnet  # noqa: F401
    import model.motion.motion  # noqa: F401
    import model.fusion.fusion  # noqa: F401
    from model.codd import ConsistentOnlineDynamicDepth

    cnet_cfg = dict(
        type="HRNet",
        norm_cfg=dict(type="SyncBN", requires_grad=False),
        norm_eval=True,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                        num_blocks=(2,), num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                        num_blocks=(2, 2), num_channels=(18, 36)),
            stage3=dict(num_modules=3, num_branches=3, block="BASIC",
                        num_blocks=(2, 2, 2), num_channels=(18, 36, 72)),
            stage4=dict(num_modules=2, num_branches=4, block="BASIC",
                        num_blocks=(2, 2, 2, 2),
                        num_channels=(18, 36, 72, 144)),
        ),
    )
    cfg = dict(
        stereo=dict(
            type="HITNetMF",
            backbone=dict(type="HITUNet"),
            initialization=dict(type="TileInitialization",
                                max_disp=MAX_DISP),
            propagation=dict(type="TilePropagation"),
        ),
        motion=dict(type="Motion", iters=ITERS,
                    raft3d=dict(type="RAFT3D", cnet_cfg=cnet_cfg)),
        fusion=dict(type="Fusion", in_channels=24, fusion_channel=32,
                    corr_cfg=dict(type="px2patch", patch_size=3)),
    )
    torch.manual_seed(42)
    ref = ConsistentOnlineDynamicDepth(**cfg)
    ref.eval()
    return ref


@pytest.mark.slow
def test_assembled_pipeline_2frame_parity():
    ref = _build_reference()

    rng = np.random.RandomState(3)
    imgs_l = rng.rand(2, B, H, W, 3).astype(np.float32)
    imgs_r = np.clip(imgs_l + rng.uniform(
        -0.05, 0.05, imgs_l.shape), 0, 1).astype(np.float32)
    fx = fy = 96.0
    intr_np = np.asarray([[fx, fy, W / 2.0, H / 2.0]], np.float32)
    img_metas = [{"intrinsics": [fx, fy, W / 2.0, H / 2.0]}]

    def t_img(x):  # NHWC float -> torch NCHW
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).contiguous()

    state = {}
    with torch.no_grad():
        out0 = ref.consistent_online_depth_estimation(
            t_img(imgs_l[0]), t_img(imgs_r[0]), img_metas, state)
        mem_after0 = [m.clone() for m in state["memory"]]
        out1 = ref.consistent_online_depth_estimation(
            t_img(imgs_l[1]), t_img(imgs_r[1]), img_metas, state)

    disp0_ref = out0["pred_disp"].numpy()[:, 0]           # (B,H,W)
    disp1_ref = out1["pred_disp"].numpy()[:, 0]
    ts_ref = out1["Ts"].data.numpy()                      # (B,H,W,7)
    mem_disp0_ref = mem_after0[2].numpy()                 # (B,H,W)
    mem_feat0_ref = np.transpose(mem_after0[1].numpy(), (0, 2, 3, 1))

    ported = port_codd_checkpoint(ref.state_dict())
    assert not ported["missing"], ported["missing"][:10]

    model = CODD(max_disp=MAX_DISP, iters=ITERS, splat_impl="xla",
                 pixel_center_offset=-0.5)
    variables = {"params": ported["params"],
                 "batch_stats": ported["batch_stats"]}
    jl = jnp.asarray(imgs_l)
    jr = jnp.asarray(imgs_r)
    ji = jnp.asarray(intr_np)

    carry, jout0 = model.apply(variables, jl[0], jr[0], ji,
                               method=CODD.first_step)
    carry2, jout1 = model.apply(variables, carry, jl[1], jr[1], ji,
                                method=CODD.step)

    # frame-0 memory contract: disparity + projected features
    d = np.abs(np.asarray(carry.memory_disp) - mem_disp0_ref)
    print(f"mem_disp frame0: max|d|={d.max():.2e}")
    np.testing.assert_allclose(np.asarray(carry.memory_disp), mem_disp0_ref,
                               atol=1e-3, rtol=0, err_msg="memory_disp f0")
    np.testing.assert_allclose(np.asarray(carry.memory_feat), mem_feat0_ref,
                               atol=1e-3, rtol=0, err_msg="memory_feat f0")
    np.testing.assert_allclose(np.asarray(jout0["pred_disp"])[..., 0],
                               disp0_ref, atol=1e-3, rtol=0,
                               err_msg="pred_disp f0")

    # frame-1: full cascade through motion (GN + dual-res splats) + fusion
    ts = np.asarray(jout1["Ts"])
    d_ts = np.abs(ts - ts_ref)
    print(f"Ts frame1: max|d|={d_ts.max():.2e}")
    np.testing.assert_allclose(ts, ts_ref, atol=1e-2, rtol=0, err_msg="Ts")

    disp1 = np.asarray(jout1["pred_disp"])[..., 0]
    d1 = np.abs(disp1 - disp1_ref)
    print(f"pred_disp frame1: max|d|={d1.max():.2e} mean={d1.mean():.2e}")
    np.testing.assert_allclose(disp1, disp1_ref, atol=1e-2, rtol=0,
                               err_msg="pred_disp f1")
