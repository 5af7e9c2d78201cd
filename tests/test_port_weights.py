"""Weight porting: torch conv layers -> flax layers produce identical outputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from codd_tpu.models.layers import Conv, ConvTranspose  # noqa: E402
from codd_tpu.utils.port_weights import (  # noqa: E402
    HITNET_MAP, convert_conv, convert_conv_transpose, port_state_dict,
    set_in_tree,
)


def test_conv_port_matches_torch():
    rng = np.random.RandomState(0)
    tconv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1)
    x = rng.randn(2, 10, 12, 5).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()

    conv = Conv(7, 3, stride=2, padding=1)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ported = convert_conv(tconv.weight.detach(), tconv.bias.detach())
    params = {"params": {"conv": ported}}
    out = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv_transpose_port_matches_torch():
    rng = np.random.RandomState(1)
    tconv = torch.nn.ConvTranspose2d(6, 4, 2, stride=2)
    x = rng.randn(1, 5, 7, 6).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()

    deconv = ConvTranspose(4, 2, 2)
    ported = convert_conv_transpose(tconv.weight.detach(), tconv.bias.detach())
    out = np.asarray(deconv.apply({"params": {"conv": ported}}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_port_state_dict_mechanics():
    sd = {
        "backbone.conv1.0.weight": torch.zeros(16, 3, 3, 3),
        "backbone.conv1.0.bias": torch.zeros(16),
    }
    tree = port_state_dict(sd, HITNET_MAP)
    assert tree["stereo"]["backbone"]["conv1"]["conv"]["kernel"].shape == (3, 3, 3, 16)
    assert "__missing__" in tree  # everything else absent from this tiny sd


def test_set_in_tree():
    t = {}
    set_in_tree(t, "a/b/c", 1)
    set_in_tree(t, "a/b/d", 2)
    assert t == {"a": {"b": {"c": 1, "d": 2}}}
