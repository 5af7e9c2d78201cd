"""Port torch reference checkpoints into codd_tpu flax params.

The reference publishes pretrained torch checkpoints (README.md:46-51).
This module converts their tensors into our NHWC/HWIO layouts:

  * Conv2d        weight (O,I,kh,kw) -> kernel (kh,kw,I,O)
  * ConvTranspose weight (I,O,kh,kw) -> kernel (kh,kw,I,O)  (flax
    ConvTranspose applies the kernel un-flipped, matching torch's
    transposed-conv semantics for stride==kernel)
  * Linear        weight (O,I)       -> kernel (I,O)
  * BatchNorm     -> FrozenBatchNorm {scale, bias} params + {mean, var}
    batch_stats

Because our module tree mirrors the reference structurally, mapping is
mostly mechanical renames; every submodule has an explicit name table:

  HITNET_MAP  — stereo (reference model/stereo/hitnet/*)
  RAFT3D_MAP  — motion (reference model/motion/raft3d/raft3d.py:141-186,
                blocks/{extractor,gru}.py; mmseg HRNet cnet per
                configs/models/codd.py:44-74)
  FUSION_MAP  — fusion (reference model/fusion/fusion.py:42-146)

``port_codd_checkpoint`` applies all three to a full reference estimator
state dict and also extracts the HITLoss plane-fit kernels (trainable in
the reference, model/losses/hitnet.py:90-104 — checkpoints may carry
drifted values that the loss must reuse for training-parity).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence, Tuple

import numpy as np

__all__ = [
    "convert_conv", "convert_conv_transpose", "set_in_tree",
    "port_state_dict", "port_codd_checkpoint",
    "HITNET_MAP", "RAFT3D_MAP", "FUSION_MAP",
]


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


# ---------------------------------------------------------------------------
# stereo: HITNetMF
# ---------------------------------------------------------------------------


def _hitnet_backbone_map():
    m = [("backbone.conv1.0", "backbone/conv1/conv")]
    for ch in ["down1", "down2", "down3"]:
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


# ---------------------------------------------------------------------------
# motion: RAFT3D (fnet + mmseg-HRNet cnet + ResizeConcatConv + update block)
# ---------------------------------------------------------------------------


def _fnet_map():
    """BasicEncoder, instance-norm variant (blocks/extractor.py:119-199) —
    instance norm has no parameters, so only convs map."""
    m = [("fnet.conv1", "fnet/conv1/conv"),
         ("fnet.conv2", "fnet/conv2/conv")]
    for ln in ("layer1", "layer2", "layer3"):
        for b in (0, 1):
            t = f"fnet.{ln}.{b}"
            f = f"fnet/{ln}_{b}"
            m += [(f"{t}.conv1", f"{f}/conv1/conv"),
                  (f"{t}.conv2", f"{f}/conv2/conv")]
            if b == 0 and ln != "layer1":  # stride-2 blocks have downsample
                m += [(f"{t}.downsample.0", f"{f}/downsample/conv")]
    return m


def _convbn(t_conv, t_bn, f_base):
    """mmcv ConvModule-style conv+BN pair -> _ConvBN {conv/conv, bn}."""
    return [(t_conv, f"{f_base}/conv/conv"), (t_bn, f"{f_base}/bn", "bn")]


def _hrnet_map(tp="cnet.0", fp="cnet"):
    """mmseg HRNet-w18-small state-dict names (mmseg hrnet.py conventions:
    conv1/bn1 stem, layer1 Bottlenecks, transition{s}, stage{s}.{m} with
    branches.{i}.{b} BasicBlocks and fuse_layers.{i}.{j})."""
    m = []
    m += _convbn(f"{tp}.conv1", f"{tp}.bn1", f"{fp}/stem1")
    m += _convbn(f"{tp}.conv2", f"{tp}.bn2", f"{fp}/stem2")
    # layer1: 2 bottlenecks, downsample on block 0 (64 -> 256)
    for b in (0, 1):
        t = f"{tp}.layer1.{b}"
        f = f"{fp}/layer1_{b}"
        for ci in (1, 2, 3):
            m += _convbn(f"{t}.conv{ci}", f"{t}.bn{ci}", f"{f}/c{ci}")
        if b == 0:
            m += _convbn(f"{t}.downsample.0", f"{t}.downsample.1", f"{f}/down")
    # transitions: (stage idx, branch idx, has nested Sequential)
    for s, i, nested in ((1, 0, False), (1, 1, True), (2, 2, True),
                         (3, 3, True)):
        t = f"{tp}.transition{s}.{i}" + (".0" if nested else "")
        m += _convbn(f"{t}.0", f"{t}.1", f"{fp}/trans{s}_{i}")
    # stages 2..4
    stage_cfg = {2: (1, 2), 3: (3, 3), 4: (2, 4)}  # {stage: (modules, branches)}
    for s, (n_mod, n_br) in stage_cfg.items():
        for mm in range(n_mod):
            t = f"{tp}.stage{s}.{mm}"
            f = f"{fp}/stage{s}_m{mm}"
            for i in range(n_br):
                for b in (0, 1):
                    tb = f"{t}.branches.{i}.{b}"
                    fb = f"{f}/branch{i}_blk{b}"
                    m += _convbn(f"{tb}.conv1", f"{tb}.bn1", f"{fb}/c1")
                    m += _convbn(f"{tb}.conv2", f"{tb}.bn2", f"{fb}/c2")
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:  # 1x1 conv + bn (+ upsample, no params)
                        tf = f"{t}.fuse_layers.{i}.{j}"
                        m += _convbn(f"{tf}.0", f"{tf}.1", f"{f}/fuse{i}_{j}")
                    elif j < i:  # chain of stride-2 conv+bn
                        for st in range(i - j):
                            tf = f"{t}.fuse_layers.{i}.{j}.{st}"
                            m += _convbn(f"{tf}.0", f"{tf}.1",
                                         f"{f}/fuse{i}_{j}_{st}")
    return m


def _update_block_map():
    tp, fp = "update_block", "gn_iter/update_block"
    m = [(f"{tp}.corr_enc.0", f"{fp}/corr_enc0/conv"),
         (f"{tp}.corr_enc.2", f"{fp}/corr_enc1/conv"),
         (f"{tp}.corr_enc.4", f"{fp}/corr_enc2/conv"),
         (f"{tp}.flow_enc.0", f"{fp}/flow_enc0/conv"),
         (f"{tp}.flow_enc.2", f"{fp}/flow_enc1/conv")]
    for g in ("convz1", "convz2", "convr1", "convr2", "convq1", "convq2"):
        m += [(f"{tp}.gru.{g}", f"{fp}/gru/{g}/conv")]
    for head in ("ae", "delta", "weight", "mask"):
        m += [(f"{tp}.{head}.0", f"{fp}/{head}0/conv"),
              (f"{tp}.{head}.2", f"{fp}/{head}1/conv")]
    return m


RAFT3D_MAP = (_fnet_map() + _hrnet_map()
              + [("cnet.1.convs.0", "cnet_out/conv/conv")]
              + _update_block_map())


# ---------------------------------------------------------------------------
# fusion
# ---------------------------------------------------------------------------


FUSION_MAP = [
    ("key_layer.0", "key0/conv"),
    ("key_layer.2.conv1.0", "key_block/conv1/conv"),
    ("key_layer.2.conv2", "key_block/conv2/conv"),
    ("key_layer.4", "key1/conv"),
    ("conv_corr.0", "conv_corr0/conv"),
    ("conv_corr.2", "conv_corr1/conv"),
    ("conv_disp.0", "conv_disp0/conv"),
    ("conv_disp.2", "conv_disp1/conv"),
    ("motion_conv.0", "motion_conv/conv"),
    ("weight_head.0", "weight_head0/conv"),
    ("weight_head.1", "weight_head1/conv"),
    ("forget_head.0", "forget_head0/conv"),
    ("forget_head.1", "forget_head1/conv"),
    ("forget_head.2", "forget_head2/conv"),
    ("residual_conv.0", "residual_conv/conv"),
]


# ---------------------------------------------------------------------------
# mechanics
# ---------------------------------------------------------------------------


def port_state_dict(state_dict: Mapping[str, Any], name_map,
                    dest_prefix: str = "stereo") -> Dict:
    """Apply a (torch_prefix, flax_path[, kind]) table.

    kinds: conv (default), deconv, shared (bare kernel/bias names), bn
    (FrozenBatchNorm: weight/bias -> params scale/bias; running stats ->
    "__batch_stats__" subtree).  Missing torch entries are reported in the
    result's "__missing__" list.
    """
    tree: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    missing = []
    for entry in name_map:
        t_prefix, f_path = entry[0], entry[1]
        kind = entry[2] if len(entry) > 2 else "conv"
        if kind == "bn":
            w = state_dict.get(t_prefix + ".weight")
            b = state_dict.get(t_prefix + ".bias")
            rm = state_dict.get(t_prefix + ".running_mean")
            rv = state_dict.get(t_prefix + ".running_var")
            if w is None or rm is None:
                missing.append(t_prefix)
                continue
            base = f"{dest_prefix}/{f_path}" if dest_prefix else f_path
            set_in_tree(tree, f"{base}/scale", _np(w))
            set_in_tree(tree, f"{base}/bias", _np(b))
            set_in_tree(stats, f"{base}/mean", _np(rm))
            set_in_tree(stats, f"{base}/var", _np(rv))
            continue
        w = state_dict.get(t_prefix + ".weight")
        b = state_dict.get(t_prefix + ".bias")
        if w is None:
            missing.append(t_prefix)
            continue
        if kind == "deconv":
            conv = convert_conv_transpose(w, b)
        else:  # conv and shared use the same layout transpose
            conv = convert_conv(w, b)
        for k, v in conv.items():
            if v is not None:
                base = f"{dest_prefix}/{f_path}" if dest_prefix else f_path
                set_in_tree(tree, f"{base}/{k}", v)
    if stats:
        tree["__batch_stats__"] = (stats[dest_prefix] if dest_prefix
                                   else stats)
    if missing:
        tree["__missing__"] = missing
    return tree


def _sub_dict(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    p = prefix + "."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def _merge(dst: Dict, src: Dict):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def port_codd_checkpoint(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Full reference estimator state dict -> flax variables.

    Returns {"params": ..., "batch_stats": ..., "hit_loss_kernels": ...,
    "missing": [...]} — params/batch_stats drop into CODD.apply variables;
    hit_loss_kernels carries the (possibly trained-drifted) HITLoss
    plane-fit convs (reference model/losses/hitnet.py:99-104) for
    losses.hitnet.hit_loss(plane_fit_kernels=...).
    """
    if "state_dict" in state_dict and not hasattr(
            state_dict["state_dict"], "shape"):
        state_dict = state_dict["state_dict"]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    missing: List[str] = []

    def apply(sub_prefix, name_map, dest):
        sub = _sub_dict(state_dict, sub_prefix)
        tree = port_state_dict(sub, name_map, dest_prefix="")
        missing.extend(f"{sub_prefix}.{k}" for k in tree.pop("__missing__", []))
        st = tree.pop("__batch_stats__", None)
        if tree:
            set_in_tree(params, dest, tree) if "/" in dest else _merge(
                params.setdefault(dest, {}), tree)
        if st:
            _merge(stats.setdefault(dest, {}), st)

    apply("stereo", HITNET_MAP, "stereo")
    raft = _sub_dict(state_dict, "motion.raft3d")
    tree = port_state_dict(raft, RAFT3D_MAP, dest_prefix="")
    missing.extend(f"motion.raft3d.{k}" for k in tree.pop("__missing__", []))
    st = tree.pop("__batch_stats__", None)
    if tree:
        params["motion"] = {"raft3d": tree}
    if st:
        stats["motion"] = {"raft3d": st}
    apply("fusion", FUSION_MAP, "fusion")

    out: Dict[str, Any] = {"params": params, "missing": missing}
    if stats:
        out["batch_stats"] = stats
    kx = state_dict.get("stereo.loss.convx.weight")
    ky = state_dict.get("stereo.loss.convy.weight")
    if kx is not None and ky is not None:
        # torch conv weight (1,1,9,9) -> (9,9) cross-correlation kernels
        out["hit_loss_kernels"] = {"convx": _np(kx)[0, 0],
                                   "convy": _np(ky)[0, 0]}
    return out
