"""Bisect the stereo parity divergence: compare reference vs JAX stage by
stage (backbone pyramid -> init cv/hyp pyramids -> propagation levels)."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests/parity")

import numpy as np
import mm_shim

mm_shim.install()

import torch
import jax.numpy as jnp

from codd_tpu.models.stereo.hitnet import (HITUNet, TileInitialization,
                                           TilePropagation)
from codd_tpu.utils.port_weights import HITNET_MAP, port_state_dict

from model.stereo.hitnet.hitnet import HITNetMF

torch.manual_seed(0)
ref = HITNetMF(backbone=dict(type="HITUNet"),
               initialization=dict(type="TileInitialization", max_disp=320),
               propagation=dict(type="TilePropagation"))
ref.eval()

rng = np.random.RandomState(7)
H, W = 64, 128
left = rng.rand(1, H, W, 3).astype(np.float32) * 2 - 1
right = rng.rand(1, H, W, 3).astype(np.float32) * 2 - 1
tl = torch.from_numpy(left).permute(0, 3, 1, 2)
tr = torch.from_numpy(right).permute(0, 3, 1, 2)

tree = port_state_dict(ref.state_dict(), HITNET_MAP, dest_prefix="")
assert "__missing__" not in tree


def cmp(name, ours, theirs, tol=1e-4):
    theirs = theirs.detach().permute(0, 2, 3, 1).numpy()
    ours = np.asarray(ours)
    if ours.shape != theirs.shape:
        print(f"{name}: SHAPE ours={ours.shape} theirs={theirs.shape}")
        return
    d = np.abs(ours - theirs)
    flag = "OK " if d.max() < tol else "BAD"
    print(f"{flag} {name}: maxdiff={d.max():.3e} mean={d.mean():.3e}")


with torch.no_grad():
    fl_t = ref.backbone(tl)
    fr_t = ref.backbone(tr)
    init_cv_t, init_hyp_t = ref.tile_init(fl_t, fr_t)

bb = HITUNet(name="backbone")
fl = bb.apply({"params": tree["backbone"]}, jnp.asarray(left))
fr = bb.apply({"params": tree["backbone"]}, jnp.asarray(right))
for i in range(5):
    cmp(f"fea_l[{i}]", fl[i], fl_t[i])

ti = TileInitialization(320, name="tile_init")
init_cv, init_hyp = ti.apply({"params": tree["tile_init"]}, fl, fr)
for i in range(5):
    cmp(f"init_cv[{i}]", init_cv[i], init_cv_t[i])
for i in range(5):
    cmp(f"init_hyp[{i}]", init_hyp[i], init_hyp_t[i])

# propagation, training mode to get every level
ref.train()
with torch.no_grad():
    out_t = ref.tile_update(fl_t, fr_t, init_hyp_t)
ref.eval()

tp = TilePropagation(name="tile_update")
final, aux = tp.apply({"params": tree["tile_update"]}, fl, fr,
                      [jnp.asarray(np.transpose(h.numpy(), (0, 2, 3, 1)))
                       for h in init_hyp_t], train=True)
for i, (o, t) in enumerate(zip(aux["prop_disp_pyramid"],
                               out_t["prop_disp_pyramid"])):
    cmp(f"prop_disp[{i}]", o, t, tol=1e-3)
for key in ("dx_pyramid", "dy_pyramid", "w_pyramid"):
    for i, (o, t) in enumerate(zip(aux[key], out_t[key])):
        cmp(f"{key}[{i}]", o, t, tol=1e-3)
