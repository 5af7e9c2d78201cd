"""Port torch reference checkpoints into codd_tpu flax params.

The reference publishes pretrained torch checkpoints (README.md:46-51).
This module converts their tensors into our NHWC/HWIO layouts:

  * Conv2d        weight (O,I,kh,kw) -> kernel (kh,kw,I,O)
  * ConvTranspose weight (I,O,kh,kw) -> kernel (kh,kw,I,O)  (flax
    ConvTranspose applies the kernel un-flipped, matching torch's
    transposed-conv semantics for stride==kernel)
  * Linear        weight (O,I)       -> kernel (I,O)
  * BatchNorm     -> FrozenBatchNorm {scale, bias} params + batch_stats

Because our module tree mirrors the reference structurally, mapping is
mostly mechanical renames; `port_state_dict` walks an explicit name table
per submodule.  Stereo (HITNetMF) is fully mapped; motion/fusion tables
extend the same machinery.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

__all__ = ["convert_conv", "convert_conv_transpose", "set_in_tree",
           "port_state_dict", "HITNET_MAP"]


def _np(t):
    return np.asarray(getattr(t, "numpy", lambda: t)())


def convert_conv(weight, bias=None) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(weight).transpose(2, 3, 1, 0)}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def convert_conv_transpose(weight, bias=None) -> Dict[str, np.ndarray]:
    # flax ConvTranspose applies the kernel spatially flipped relative to
    # torch's transposed conv; flip while transposing
    k = _np(weight).transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    out = {"kernel": k}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def set_in_tree(tree: Dict, path: str, value):
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _conv_seq(prefix_t: str, names: Tuple[str, ...], torch_indices,
              flax_path: str):
    """Map a torch nn.Sequential of convs to named flax Conv modules."""
    return [(f"{prefix_t}.{ti}", f"{flax_path}/{fn}/conv")
            for ti, fn in zip(torch_indices, names)]


def _hitnet_backbone_map():
    m = [("backbone.conv1.0", "backbone/conv1/conv")]
    for i, ch in enumerate(["down1", "down2", "down3"], start=1):
        m += [(f"backbone.{ch}.0", f"backbone/{ch}/c0/conv"),
              (f"backbone.{ch}.2", f"backbone/{ch}/c1/conv")]
    # down4: Sequential(conv_down, conv, lrelu, conv, lrelu)
    m += [("backbone.down4.0.0", "backbone/down4_0/c0/conv"),
          ("backbone.down4.0.2", "backbone/down4_0/c1/conv"),
          ("backbone.down4.1", "backbone/down4_1/conv"),
          ("backbone.down4.3", "backbone/down4_2/conv")]
    for up in ["up4", "up3", "up2", "up1"]:
        m += [(f"backbone.{up}.0", f"backbone/{up}/conv", "deconv")]
    for mg in ["merge4", "merge3", "merge2", "merge1"]:
        m += [(f"backbone.{mg}.0", f"backbone/{mg}/c0/conv"),
              (f"backbone.{mg}.2", f"backbone/{mg}/c1/conv"),
              (f"backbone.{mg}.4", f"backbone/{mg}/c2/conv")]
    return m


def _hitnet_init_map():
    m = []
    for lvl in ["1x", "2x", "4x", "8x", "16x"]:
        m += [(f"tile_init.tile_conv{lvl}.0", f"tile_init/tile_conv{lvl}/c0",
               "shared"),
              (f"tile_init.tile_conv{lvl}.2",
               f"tile_init/tile_conv{lvl}/c1/conv")]
        m += [(f"tile_init.tile_fea_dscrpt{lvl}.0",
               f"tile_init/tile_fea_dscrpt{lvl}/conv")]
    return m


def _resblock(prefix_t, flax_path):
    return [(f"{prefix_t}.conv1.0.0", f"{flax_path}/conv1/conv"),
            (f"{prefix_t}.conv2.0", f"{flax_path}/conv2/conv")]


def _hitnet_prop_map():
    m = []
    # TileUpdate0
    m += [("tile_update.tile_update0.decrease.0",
           "tile_update/tile_update0/cv/decrease/conv"),
          ("tile_update.tile_update0.conv0.0",
           "tile_update/tile_update0/conv0/conv"),
          ("tile_update.tile_update0.lastconv",
           "tile_update/tile_update0/lastconv/conv")]
    for i in (0, 1):
        m += _resblock(f"tile_update.tile_update0.resblock{i}.0",
                       f"tile_update/tile_update0/resblock{i}")
    # TileUpdate 1..4
    for k in (1, 2, 3, 4):
        base_t = f"tile_update.tile_update{k}"
        base_f = f"tile_update/tile_update{k}"
        m += [(f"{base_t}.decrease.0", f"{base_f}/cv/decrease/conv"),
              (f"{base_t}.conv0.0", f"{base_f}/conv0/conv"),
              (f"{base_t}.lastconv", f"{base_f}/lastconv/conv")]
        for i in (0, 1):
            m += _resblock(f"{base_t}.resblock{i}.0", f"{base_f}/resblock{i}")
    # PostTileUpdate 4_1, 5 and FinalTileUpdate 6
    for name, nblocks in (("tile_update4_1", 4), ("tile_update5", 4),
                          ("tile_update6", 2)):
        base_t = f"tile_update.{name}"
        base_f = f"tile_update/{name}"
        m += [(f"{base_t}.conv1.0", f"{base_f}/conv1_0/conv"),
              (f"{base_t}.conv1.2", f"{base_f}/conv1_1/conv"),
              (f"{base_t}.lastconv", f"{base_f}/lastconv/conv")]
        for i in range(nblocks):
            m += _resblock(f"{base_t}.resblocks.{i}.0", f"{base_f}/resblock{i}")
    return m


HITNET_MAP = _hitnet_backbone_map() + _hitnet_init_map() + _hitnet_prop_map()


def port_state_dict(state_dict: Mapping[str, Any], name_map,
                    dest_prefix: str = "stereo") -> Dict:
    """Apply a (torch_prefix, flax_path[, kind]) table.  Returns the params
    subtree; missing torch entries are skipped (reported in the result's
    "__missing__" list for inspection)."""
    tree: Dict[str, Any] = {}
    missing = []
    for entry in name_map:
        t_prefix, f_path = entry[0], entry[1]
        kind = entry[2] if len(entry) > 2 else "conv"
        w = state_dict.get(t_prefix + ".weight")
        b = state_dict.get(t_prefix + ".bias")
        if w is None:
            missing.append(t_prefix)
            continue
        if kind == "deconv":
            conv = convert_conv_transpose(w, b)
        elif kind == "shared":
            conv = convert_conv(w, b)
            conv = {"kernel": conv["kernel"], "bias": conv.get("bias")}
        else:
            conv = convert_conv(w, b)
        for k, v in conv.items():
            if v is not None:
                set_in_tree(tree, f"{dest_prefix}/{f_path}/{k}", v)
    if missing:
        tree["__missing__"] = missing
    return tree
