"""Golden parity: reference torch Fusion (model/fusion/fusion.py:42) vs the
JAX rebuild — covers the patch correlations, disparity confidence, fuse and
forget heads, and the final blend (VERDICT round-1 item 3)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import mm_shim  # noqa: E402

mm_shim.install()

import jax.numpy as jnp  # noqa: E402

from codd_tpu.models.fusion.fusion import Fusion  # noqa: E402
from codd_tpu.utils.port_weights import FUSION_MAP, port_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def ref_model():
    from model.fusion.fusion import Fusion as RefFusion

    torch.manual_seed(3)
    m = RefFusion(in_channels=24, fusion_channel=32)
    m.eval()
    return m


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def test_map_covers_every_reference_parameter(ref_model):
    sd = ref_model.state_dict()
    consumed = set()
    for entry in FUSION_MAP:
        for suffix in (".weight", ".bias"):
            if entry[0] + suffix in sd:
                consumed.add(entry[0] + suffix)
    uncovered = sorted(set(sd.keys()) - consumed)
    assert not uncovered, f"map misses reference params: {uncovered}"
    tree = port_state_dict(sd, FUSION_MAP, dest_prefix="")
    assert "__missing__" not in tree


def test_fusion_golden_parity(ref_model):
    rng = np.random.RandomState(5)
    B, H, W, fc = 1, 32, 64, 32
    H4, W4 = H // 4, W // 4

    left_feat = rng.randn(B, H4, W4, 24).astype(np.float32)
    right_feat = rng.randn(B, H4, W4, 24).astype(np.float32)
    pred_curr = (rng.rand(B, H, W, 1) * 40 + 1).astype(np.float32)
    pred_warp = (rng.rand(B, H, W, 1) * 40).astype(np.float32)
    pred_warp[:, :4] = 0.0  # exercise the (pred_warp > 0) gate
    feat_warp = rng.randn(B, H4, W4, fc).astype(np.float32)
    flow_warp = rng.randn(B, H, W, 3).astype(np.float32)
    confidence_warp = rng.rand(B, H, W, 3).astype(np.float32)
    left_img = rng.rand(B, H, W, 3).astype(np.float32)

    # ---- reference: memory_query mutates `outputs` in place ----
    outputs = {
        "left_feat": _nchw(left_feat),
        "right_feat": _nchw(right_feat),
        "pred_disp": _nchw(pred_curr),
        "left_img": _nchw(left_img),
    }
    state = {"memory": [
        _nchw(left_img), _nchw(feat_warp), _nchw(confidence_warp),
        _nchw(pred_warp), _nchw(flow_warp)]}
    with torch.no_grad():
        ref_model.memory_query(outputs, state)
    ref_disp = outputs["pred_disp"].permute(0, 2, 3, 1).numpy()
    ref_wf = outputs["fusion_weights"].permute(0, 2, 3, 1).numpy()
    ref_wr = outputs["reset_weights"].permute(0, 2, 3, 1).numpy()
    ref_feat_curr = outputs["left_feat"].permute(0, 2, 3, 1).numpy()

    # ---- JAX ----
    tree = port_state_dict(ref_model.state_dict(), FUSION_MAP, dest_prefix="")
    assert "__missing__" not in tree
    model = Fusion(in_channels=24, fusion_channel=fc)
    variables = {"params": tree}

    feat_curr = model.apply(variables, jnp.asarray(left_feat),
                            method=Fusion.project)
    np.testing.assert_allclose(np.asarray(feat_curr), ref_feat_curr,
                               atol=1e-4, rtol=1e-4)

    disp_fused, wf, wr = model.apply(
        variables, jnp.asarray(pred_curr), jnp.asarray(pred_warp),
        feat_curr, jnp.asarray(feat_warp), jnp.asarray(flow_warp),
        jnp.asarray(confidence_warp), jnp.asarray(left_feat),
        jnp.asarray(right_feat))

    np.testing.assert_allclose(np.asarray(wf), ref_wf, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(wr), ref_wr, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(disp_fused), ref_disp,
                               atol=2e-3, rtol=1e-4)
