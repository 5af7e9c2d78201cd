"""Sequence evaluator: meters accumulate, padding masked, metric sanity."""

import numpy as np

import jax
import jax.numpy as jnp

from codd_tpu.apis.evaluation import make_sequence_evaluator
from codd_tpu.models.codd import CODD


def test_sequence_evaluator_end_to_end():
    model = CODD(max_disp=64, iters=1)
    B, T, H, W = 1, 3, 64, 128
    rng = np.random.RandomState(0)
    l = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
    r = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32))
    intr = jnp.asarray([[100.0, 100.0, W / 2, H / 2]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), l, r, intr)

    batch = {
        "l_img": l, "r_img": r, "intrinsics": intr,
        "img_hw": jnp.asarray([60, 120], jnp.int32),  # pre-pad extent
        "frame_valid": jnp.asarray([True, True, True]),
        "gt_disp": jnp.asarray(
            rng.uniform(2, 40, (B, T, H, W, 1)).astype(np.float32)),
        "gt_flow": jnp.asarray(
            rng.uniform(-2, 2, (B, T, H, W, 2)).astype(np.float32)),
        "gt_disp_change": jnp.asarray(
            rng.uniform(-1, 1, (B, T, H, W, 1)).astype(np.float32)),
    }
    ev = make_sequence_evaluator(model, has_disp_change=True)
    metrics = jax.tree_util.tree_map(np.asarray, ev(params, batch))

    for k in ("epe", "th3", "tepe", "th3_tepe", "tepe_rel", "th1_tepe_rel",
              "flow_mag", "count", "epe2d_scene_flow", "epe2d_optical_flow",
              "1px_scene_flow", "1px_optical_flow"):
        assert k in metrics, k
        assert np.isfinite(metrics[k]), k
    assert metrics["count"] > 0
    assert 0 <= metrics["th3"] <= 1
    assert metrics["epe"] > 0

    # padded (invalid) trailing frame must not change the meters
    batch2 = dict(batch)
    batch2["frame_valid"] = jnp.asarray([True, True, False])
    m2 = jax.tree_util.tree_map(np.asarray, ev(params, batch2))
    assert m2["count"] < metrics["count"]
    # flow_mag meter counts only valid frame transitions
    assert m2["flow_mag"] == np.float32(m2["flow_mag"])
