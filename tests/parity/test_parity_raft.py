"""Golden parity: RAFT-3D torch sub-modules vs the JAX rebuild.

Full RAFT3D forward needs lietorch_extras CUDA kernels (se3_build /
cholesky6x6 / corr_index), so parity is asserted at the sub-module level
(VERDICT round-1 item 3): BasicEncoder (fnet), ConvGRU, BasicUpdateBlock,
ResizeConcatConv, and the CorrBlock pyramid construction.  The GN solver
itself is covered by dense-oracle tests in tests/test_ops_gn.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import mm_shim  # noqa: E402

mm_shim.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from codd_tpu.models.motion.encoders import BasicEncoder  # noqa: E402
from codd_tpu.models.motion.raft3d import BasicUpdateBlock, ConvGRU  # noqa: E402
from codd_tpu.utils.port_weights import (  # noqa: E402
    _fnet_map, _update_block_map, port_state_dict)


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _to_nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def test_basic_encoder_parity():
    from model.motion.raft3d.blocks.extractor import BasicEncoder as RefEnc

    torch.manual_seed(1)
    ref = RefEnc(output_dim=128, norm_fn="instance")
    ref.eval()

    rng = np.random.RandomState(2)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        out_ref = _to_nhwc(ref(_nchw(x)))

    sd = {"fnet." + k: v for k, v in ref.state_dict().items()}
    consumed = set()
    for entry in _fnet_map():
        for suf in (".weight", ".bias"):
            if entry[0] + suf in sd:
                consumed.add(entry[0] + suf)
    assert not set(sd) - consumed, sorted(set(sd) - consumed)

    tree = port_state_dict(sd, _fnet_map(), dest_prefix="")
    assert "__missing__" not in tree
    out = BasicEncoder(output_dim=128).apply(
        {"params": tree["fnet"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4, rtol=1e-4)


def test_update_block_and_gru_parity():
    from model.motion.raft3d.raft3d import BasicUpdateBlock as RefUB

    torch.manual_seed(4)
    ref = RefUB(hidden_dim=128)
    ref.eval()

    rng = np.random.RandomState(5)
    B, H, W = 1, 8, 12
    net = np.tanh(rng.randn(B, H, W, 128)).astype(np.float32)
    inp = np.maximum(rng.randn(B, H, W, 384), 0).astype(np.float32)
    corr = rng.randn(B, H, W, 196).astype(np.float32)
    flow = rng.randn(B, H, W, 2).astype(np.float32)
    dz = rng.randn(B, H, W, 1).astype(np.float32)
    twist = rng.randn(B, H, W, 6).astype(np.float32)

    with torch.no_grad():
        # reference forward(net, inp, corr, flow, twist, dz) builds
        # motion_info = cat([flow, 10*dz, 10*twist], -1) in NHWC then
        # permutes (raft3d.py:93-95): net/inp/corr are NCHW, flow/twist/dz
        # are channel-last
        net_r, mask_r, ae_r, delta_r, weight_r = ref(
            _nchw(net), _nchw(inp), _nchw(corr),
            torch.from_numpy(flow), torch.from_numpy(twist),
            torch.from_numpy(dz))

    sd = {"update_block." + k: v for k, v in ref.state_dict().items()}
    consumed = set()
    for entry in _update_block_map():
        for suf in (".weight", ".bias"):
            if entry[0] + suf in sd:
                consumed.add(entry[0] + suf)
    assert not set(sd) - consumed, sorted(set(sd) - consumed)

    tree = port_state_dict(sd, _update_block_map(), dest_prefix="")
    assert "__missing__" not in tree
    params = tree["gn_iter"]["update_block"]

    net_j, mask_j, ae_j, delta_j, weight_j = BasicUpdateBlock().apply(
        {"params": params}, jnp.asarray(net), jnp.asarray(inp),
        jnp.asarray(corr), jnp.asarray(flow), jnp.asarray(dz),
        jnp.asarray(twist))

    for ours, theirs, name in (
            (net_j, net_r, "net"), (mask_j, mask_r, "mask"),
            (ae_j, ae_r, "ae"), (delta_j, delta_r, "delta"),
            (weight_j, weight_r, "weight")):
        np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_conv_gru_parity():
    from model.motion.raft3d.blocks.gru import ConvGRU as RefGRU

    torch.manual_seed(6)
    ref = RefGRU(hidden_dim=16)
    ref.eval()
    rng = np.random.RandomState(7)
    h = np.tanh(rng.randn(1, 6, 10, 16)).astype(np.float32)
    a = rng.randn(1, 6, 10, 48).astype(np.float32)
    b = rng.randn(1, 6, 10, 48).astype(np.float32)
    with torch.no_grad():
        out_ref = _to_nhwc(ref(_nchw(h), _nchw(a), _nchw(b)))

    name_map = [(f"gru.{g}", f"gru/{g}/conv")
                for g in ("convz1", "convz2", "convr1", "convr2",
                          "convq1", "convq2")]
    sd = {"gru." + k: v for k, v in ref.state_dict().items()}
    tree = port_state_dict(sd, name_map, dest_prefix="")
    assert "__missing__" not in tree
    out = ConvGRU(hidden_dim=16).apply(
        {"params": tree["gru"]}, jnp.asarray(h), jnp.asarray(a),
        jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5, rtol=1e-5)


def test_resize_concat_conv_parity():
    """The reference resizes every branch to inputs[1]'s (1/8) resolution
    with align_corners=True bilinear (raft3d.py:109-137)."""
    from model.motion.raft3d.raft3d import ResizeConcatConv as RefRCC

    from codd_tpu.models.motion.hrnet import ResizeConcatConv

    torch.manual_seed(8)
    ref = RefRCC([4, 8, 16, 32], out_channels=64)
    ref.eval()
    rng = np.random.RandomState(9)
    shapes = [(1, 16, 24, 4), (1, 8, 12, 8), (1, 4, 6, 16), (1, 2, 3, 32)]
    xs = [rng.randn(*s).astype(np.float32) for s in shapes]
    with torch.no_grad():
        out_ref = _to_nhwc(ref([_nchw(x) for x in xs]))

    tree = port_state_dict(
        {k: v for k, v in ref.state_dict().items()},
        [("convs.0", "conv/conv")], dest_prefix="")
    out = ResizeConcatConv(out_channels=64).apply(
        {"params": tree}, [jnp.asarray(x) for x in xs])
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4, rtol=1e-4)


def test_corr_pyramid_parity():
    """CorrBlock volume + pooled pyramid vs our pooled-feature formulation.

    The reference pools the 4D correlation volume (blocks/corr.py:40-43);
    we pool fmap2 features instead (correlation is linear in fmap2, see
    ops/corr.py).  Equality of every pyramid level's dense volume is the
    exact statement of that identity — checked here against torch."""
    from model.motion.raft3d.blocks.corr import CorrBlock

    from codd_tpu.ops.corr import build_corr_pyramid

    torch.manual_seed(10)
    rng = np.random.RandomState(11)
    B, H, W, C = 1, 16, 24, 32
    f1 = rng.randn(B, H, W, C).astype(np.float32)
    f2 = rng.randn(B, H, W, C).astype(np.float32)

    ref = CorrBlock(_nchw(f1), _nchw(f2), num_levels=4, radius=3)

    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    # ours: normalized f1 + pooled fmap2 features per level (bf16 storage)
    q = pyr["f1"].reshape(B, H * W, C).astype(jnp.float32)
    for i, f2_l in enumerate(pyr["levels"]):
        p = f2_l.reshape(B, -1, C).astype(jnp.float32)
        ours = jnp.einsum("bqc,bpc->bqp", q, p)
        theirs = ref.corr_pyramid[i].reshape(B, H * W, -1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   atol=0.05, rtol=0.02,
                                   err_msg=f"corr level {i} (bf16 storage)")
