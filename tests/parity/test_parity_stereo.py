"""Golden parity: reference torch HITNetMF vs the JAX rebuild.

Random-init the reference stereo network (model/stereo/hitnet/hitnet.py:14),
port its state dict through HITNET_MAP, and assert the JAX HITNetStereo
produces the same outputs on the same input — certifying every layout /
ordering decision in the stereo stack (VERDICT round-1 item 3).

Two robustness measures for random-weight comparison:
  * input is 128x256 — at 64x128 the 16x tile grid has height 1 and the
    reference's align_corners y-normalization divides by zero
    (initialization.py:26: (size(2)-1) == 0), a degenerate-resolution
    artifact, not a real path;
  * each TileUpdate's two confidence channels get a decisive +-2 bias so
    the cur-vs-prev argmax selection (propagation.py:228-240) cannot flip
    on 1e-6 float noise between frameworks; both branches' exact values
    are still asserted via the *_cur/*_pre training planes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import mm_shim  # noqa: E402

mm_shim.install()

import jax.numpy as jnp  # noqa: E402

from codd_tpu.models.stereo.hitnet import HITNetStereo  # noqa: E402
from codd_tpu.utils.port_weights import HITNET_MAP, port_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def ref_model():
    from model.stereo.hitnet.hitnet import HITNetMF

    torch.manual_seed(0)
    m = HITNetMF(
        backbone=dict(type="HITUNet"),
        initialization=dict(type="TileInitialization", max_disp=320),
        propagation=dict(type="TilePropagation"),
    )
    # decisive hypothesis selection: cur wins on even levels, prev on odd
    with torch.no_grad():
        for k in (1, 2, 3, 4):
            bias = getattr(m.tile_update, f"tile_update{k}").lastconv.bias
            bias[0] += 2.0 if k % 2 else -2.0   # prev-conf channel
            bias[1] += -2.0 if k % 2 else 2.0   # cur-conf channel
    m.eval()
    return m


def test_map_covers_every_reference_parameter(ref_model):
    sd = ref_model.state_dict()
    consumed = set()
    for entry in HITNET_MAP:
        for suffix in (".weight", ".bias"):
            k = entry[0] + suffix
            if k in sd:
                consumed.add(k)
    uncovered = sorted(set(sd.keys()) - consumed)
    assert not uncovered, f"map misses reference params: {uncovered}"

    tree = port_state_dict(sd, HITNET_MAP, dest_prefix="")
    assert "__missing__" not in tree, tree.get("__missing__")


def test_stereo_golden_parity_eval(ref_model):
    rng = np.random.RandomState(7)
    H, W = 128, 256
    left = rng.rand(1, H, W, 3).astype(np.float32) * 2.0 - 1.0
    right = rng.rand(1, H, W, 3).astype(np.float32) * 2.0 - 1.0

    with torch.no_grad():
        ref = ref_model.stereo_matching(
            torch.from_numpy(left).permute(0, 3, 1, 2),
            torch.from_numpy(right).permute(0, 3, 1, 2))
    ref_disp = ref["pred_disp"].permute(0, 2, 3, 1).numpy()
    ref_feat = ref["left_feat"].permute(0, 2, 3, 1).numpy()

    tree = port_state_dict(ref_model.state_dict(), HITNET_MAP, dest_prefix="")
    assert "__missing__" not in tree
    out = HITNetStereo(max_disp=320).apply(
        {"params": tree}, jnp.asarray(left), jnp.asarray(right), train=False)

    np.testing.assert_allclose(np.asarray(out["left_feat"]), ref_feat,
                               atol=1e-4, rtol=1e-4)
    d = np.abs(np.asarray(out["pred_disp"]) - ref_disp)
    # tile-init argmin can flip on near-tie costs under 1e-6 noise; require
    # overwhelming agreement plus tight bulk accuracy
    assert np.quantile(d, 0.999) < 1e-3, np.quantile(d, 0.999)
    assert d.mean() < 1e-4, d.mean()


def test_stereo_golden_parity_train_pyramids(ref_model):
    """Training mode: all 12 propagation levels + init cost volumes match
    (reference propagation.py:374-451, initialization.py:227-230)."""
    rng = np.random.RandomState(11)
    H, W = 128, 256
    left = rng.rand(1, H, W, 3).astype(np.float32)
    right = rng.rand(1, H, W, 3).astype(np.float32)

    ref_model.train()
    try:
        with torch.no_grad():
            ref = ref_model.stereo_matching(
                torch.from_numpy(left).permute(0, 3, 1, 2),
                torch.from_numpy(right).permute(0, 3, 1, 2))
    finally:
        ref_model.eval()

    tree = port_state_dict(ref_model.state_dict(), HITNET_MAP, dest_prefix="")
    out = HITNetStereo(max_disp=320).apply(
        {"params": tree}, jnp.asarray(left), jnp.asarray(right), train=True)

    for key, tol in (("init_cv_pyramid", 1e-3), ("prop_disp_pyramid", 5e-3),
                     ("dx_pyramid", 5e-3), ("dy_pyramid", 5e-3),
                     ("w_pyramid", 5e-3)):
        assert len(out[key]) == len(ref[key]), key
        for i, (ours, theirs) in enumerate(zip(out[key], ref[key])):
            theirs = theirs.permute(0, 2, 3, 1).numpy()
            d = np.abs(np.asarray(ours) - theirs)
            assert np.quantile(d, 0.999) < tol, f"{key}[{i}]: q999={np.quantile(d, 0.999)}"
            assert d.mean() < tol / 10, f"{key}[{i}]: mean={d.mean()}"
