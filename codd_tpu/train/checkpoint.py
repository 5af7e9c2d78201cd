"""Orbax checkpointing: save/restore {params, opt_state, step} + metadata.

Replaces the mmcv checkpoint hooks (reference: train.py:163-174,
apis/train.py:98-101) with the two reference-visible flows:
  * ``--resume-from``: full state (params + optimizer + step),
  * ``--load-from``:   weights only.
Config text and environment info ride along as metadata, mirroring the
reference's checkpoint meta.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "restore_params"]


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state, meta: Optional[Dict[str, Any]] = None):
    """Save a TrainState under ``path`` (a directory)."""
    path = os.path.abspath(path)
    _ckptr().save(path, {"params": state.params,
                         "opt_state": state.opt_state,
                         "step": state.step}, force=True)
    if meta:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    return path


def restore_checkpoint(path: str, state):
    """Full resume: params + optimizer + step (reference --resume-from)."""
    tpl = {"params": state.params, "opt_state": state.opt_state,
           "step": state.step}
    restored = _ckptr().restore(os.path.abspath(path), item=tpl)
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def restore_params(path: str, params=None):
    """Weights-only restore (reference --load-from).  ``params`` is only a
    structural template; the on-disk optimizer state is ignored."""
    restored = _ckptr().restore(os.path.abspath(path))
    return restored["params"]
