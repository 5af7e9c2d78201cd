"""Offline inference over a test dataset: eval tables / saved disparities.

The reference flow (reference: apis/inference.py, inference.py CLI):
iterate whole sequences, per sequence either evaluate metrics (pushed into
a RunningStatsWithBuffer, dumped as CSV + ascii summary) or save the
predicted disparities as ``<name>.disp.pred.npz``.

TPU specifics: sequences are padded on the frame axis to a small set of
bucket lengths so each unique (T, H, W) compiles once; padded frames are
masked out of every metric.  Metrics stay on device for the whole
sequence and transfer once (cf. SURVEY §3.5).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.codd import CODD
from ..utils.running_stats import RunningStatsWithBuffer
from .evaluation import METER_NAMES, SUM_NAMES, make_sequence_evaluator

__all__ = ["run_inference", "summarize"]

GT_KEYS = ("gt_disp", "gt_flow", "gt_disp_change", "gt_flow_occ", "gt_disp2",
           "gt_disp_occ")


def _bucket_len(t: int, buckets=(2, 5, 10, 20, 30, 40, 50)) -> int:
    for b in buckets:
        if t <= b:
            return b
    return -(-t // 10) * 10


def _to_batch(sample: Dict[str, Any]) -> Dict[str, Any]:
    """Clip sample -> padded (B=1) device batch + frame validity."""
    T = sample["imgs"].shape[0]
    Tb = _bucket_len(T)
    batch: Dict[str, Any] = {}

    def padT(x):
        if Tb == T:
            return x[None]
        pads = [(0, Tb - T)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pads, mode="edge")[None]

    batch["l_img"] = padT(sample["imgs"])
    batch["r_img"] = padT(sample["r_imgs"])
    for k in GT_KEYS:
        if k in sample:
            batch[k] = padT(sample[k])
    meta = sample["meta"]
    intr = meta.get("intrinsics") or [1.0, 1.0, 0.0, 0.0]
    batch["intrinsics"] = np.asarray([intr], np.float32)
    batch["img_hw"] = np.asarray(meta["img_shape"], np.int32)
    batch["frame_valid"] = np.arange(Tb) < T
    return batch


def _make_show_fn(model: CODD):
    def show(params, batch):
        l_seq, r_seq, intr = batch["l_img"], batch["r_img"], batch["intrinsics"]
        carry, out0 = model.apply(params, l_seq[:, 0], r_seq[:, 0], intr,
                                  method=CODD.first_step)

        def body(carry, x):
            carry, out = model.apply(params, carry, x[0], x[1], intr,
                                     method=CODD.step)
            return carry, out["pred_disp"]

        xs = (jnp.moveaxis(l_seq[:, 1:], 1, 0), jnp.moveaxis(r_seq[:, 1:], 1, 0))
        _, disps = jax.lax.scan(body, carry, xs)
        disps = jnp.concatenate([out0["pred_disp"][None], disps], 0)
        return disps[:, 0, ..., 0]  # (T, H, W)

    return jax.jit(show)


def run_inference(
    model: CODD,
    params,
    dataset,
    evaluate: bool = True,
    show_dir: Optional[str] = None,
    reciprocal: bool = False,
    out_csv: Optional[str] = None,
    metric: str = "default",
    log=print,
) -> Dict[str, float]:
    """Evaluate (or dump) every sequence of ``dataset``.

    Returns the aggregate metric dict (reference evaluate() tables)."""
    evaluators: Dict[Any, Any] = {}
    show_fn = _make_show_fn(model) if show_dir else None
    stats = RunningStatsWithBuffer(path=out_csv)

    # multi-host: shard sequences by process (reference rank/world_size
    # dataset split, inference.py:101-103); rows re-merge automatically
    # below via process_allgather (reference dist.all_gather_object +
    # rank-0 reduce, apis/inference.py:146-154)
    host, n_hosts = jax.process_index(), jax.process_count()
    local_rows: List[Any] = []  # (seq_idx, metric values) for the allgather

    for i in range(host, len(dataset), n_hosts):
        sample = dataset[i]
        batch = _to_batch(sample)
        name = sample["meta"]["filename"]

        if show_dir:
            disps = np.asarray(show_fn(params, batch))
            T = sample["imgs"].shape[0]
            h, w = sample["meta"]["img_shape"]
            disp = disps[:T, :h, :w]
            if reciprocal and sample["meta"].get("calib"):
                disp = sample["meta"]["calib"] / np.maximum(disp, 1e-6)
            out_file = osp.join(show_dir,
                                osp.splitext(name)[0] + ".disp.pred.npz")
            os.makedirs(osp.dirname(out_file), exist_ok=True)
            np.savez_compressed(out_file, disp=disp)
            continue

        if evaluate:
            key = (batch["l_img"].shape[1:4],
                   tuple(sorted(k for k in GT_KEYS if k in batch)))
            if key not in evaluators:
                evaluators[key] = make_sequence_evaluator(
                    model,
                    disp_range=tuple(sample["meta"]["disp_range"]),
                    has_disp2="gt_disp2" in batch,
                    has_flow_occ="gt_flow_occ" in batch,
                    has_disp_change="gt_disp_change" in batch,
                    has_disp_occ="gt_disp_occ" in batch,
                )
            metrics = jax.tree_util.tree_map(
                float, evaluators[key](params, batch))
            if stats.header is None:
                stats.header = ["filename"] + list(METER_NAMES) + list(SUM_NAMES)
            vals = ([metrics[k] for k in METER_NAMES]
                    + [metrics[k] for k in SUM_NAMES])
            stats.push(name, vals)
            local_rows.append((i, vals))

    if show_dir or not evaluate:
        return {}

    if n_hosts > 1:
        stats = _merge_hosts(local_rows, dataset, n_hosts, out_csv)
    if out_csv and (n_hosts == 1 or host == 0):
        stats.dump()
    return summarize(stats, metric=metric, log=log)


def _merge_hosts(local_rows, dataset, n_hosts: int,
                 out_csv) -> RunningStatsWithBuffer:
    """All-gather per-sequence metric rows across hosts (reference
    dist.all_gather_object + reduce, apis/inference.py:146-154).

    Rows travel as a fixed-shape (max_n, 1+width) array per host —
    [sequence index, metrics...], index -1 padding — because
    process_allgather moves arrays, not python objects; every host can map
    indices back to names via dataset.sequence_name."""
    from jax.experimental import multihost_utils

    width = len(METER_NAMES) + len(SUM_NAMES)
    max_n = -(-len(dataset) // n_hosts)
    arr = np.full((max_n, 1 + width), -1.0, np.float32)
    for r, (idx, vals) in enumerate(local_rows):
        arr[r, 0] = idx
        arr[r, 1:] = vals
    gathered = np.asarray(multihost_utils.process_allgather(arr))
    gathered = gathered.reshape(-1, 1 + width)

    merged = RunningStatsWithBuffer(path=out_csv)
    merged.header = ["filename"] + list(METER_NAMES) + list(SUM_NAMES)
    order = np.argsort(gathered[:, 0], kind="stable")
    for row in gathered[order]:
        if row[0] >= 0:
            merged.push(dataset.sequence_name(int(row[0])), list(row[1:]))
    return merged


def _ascii_table(header, row) -> str:
    """Reference-style summary grid (AsciiTable, custom_stereo_mf.py:382)."""
    cells = [str(c) for c in row]
    widths = [max(len(h), len(c)) for h, c in zip(header, cells)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    def line(vals):
        return "| " + " | ".join(v.ljust(w) for v, w in zip(vals, widths)) + " |"
    return "\n".join([sep, line(header), sep, line(cells), sep])


def summarize(stats: RunningStatsWithBuffer, metric: str = "default",
              log=print) -> Dict[str, float]:
    """Aggregate per-sequence rows into the reference's summary tables with
    metric-mode selection default|disp_only|motion_only
    (custom_stereo_mf.py:432-458): disparity metrics average per-sequence
    means (AverageMeter semantics); scene-flow metrics are ratio-of-sums."""
    allowed = ("default", "disp_only", "motion_only")
    if metric not in allowed:
        raise KeyError(f"metric {metric} is not supported (one of {allowed})")
    rows = np.asarray(list(stats.buffer.values()), np.float64)
    out: Dict[str, float] = {}
    if rows.size == 0:
        return out

    disp_vals = {n: float(rows[:, j].mean())
                 for j, n in enumerate(METER_NAMES)}
    base = len(METER_NAMES)
    count = max(rows[:, base].sum(), 1.0)
    motion_vals = {n: float(rows[:, base + 1 + j].sum() / count)
                   for j, n in enumerate(SUM_NAMES[1:])}

    if metric in ("default", "disp_only"):
        keys = list(METER_NAMES)
        log("Summary:")
        log("\n" + _ascii_table(keys, [round(disp_vals[k], 3) for k in keys]))
        out.update(disp_vals)
    if metric in ("default", "motion_only"):
        keys = [n for n in SUM_NAMES if n != "count"]
        log("Summary:")
        log("\n" + _ascii_table(keys, [round(motion_vals[k], 3) for k in keys]))
        out.update(motion_vals)
        out["count"] = float(rows[:, base].sum())
    return out
