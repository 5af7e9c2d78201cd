"""Point-cloud export/visualization from saved disparity predictions.

Reference parity (utils/vis_point_cloud.py): turn ``<name>.disp.pred.npz``
files into viewable 3-D point clouds.  The reference requires open3d for
interactive viewing; here the core path writes standard PLY files (viewable
in any tool) and interactive viewing uses open3d only when importable.
"""

from __future__ import annotations

import argparse
import glob
import os.path as osp
from typing import Optional, Sequence

import numpy as np

__all__ = ["disparity_to_points", "write_ply", "npz_to_ply", "main"]


def disparity_to_points(disp: np.ndarray, intrinsics: Sequence[float],
                        calib: float, image: Optional[np.ndarray] = None,
                        max_depth: float = 100.0):
    """Disparity (H,W) -> (N,3) points + (N,3) colors (0-255)."""
    fx, fy, cx, cy = intrinsics
    H, W = disp.shape
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    with np.errstate(divide="ignore"):
        depth = calib / np.maximum(disp, 1e-6)
    valid = (disp > 0) & np.isfinite(depth) & (depth < max_depth)
    z = depth[valid]
    x = (xs[valid] - cx) / fx * z
    y = (ys[valid] - cy) / fy * z
    pts = np.stack([x, y, z], -1)
    if image is not None:
        colors = image[valid][:, :3].astype(np.uint8)
    else:
        t = np.clip(z / max_depth, 0, 1)
        colors = np.stack([255 * t, 128 * (1 - t), 255 * (1 - t)], -1
                          ).astype(np.uint8)
    return pts, colors


def write_ply(path: str, points: np.ndarray, colors: np.ndarray):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(points)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(b"end_header\n")
        rec = np.zeros(len(points),
                       dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
        rec["xyz"] = points.astype(np.float32)
        rec["rgb"] = colors
        rec.tofile(f)


def npz_to_ply(npz_path: str, out_dir: str, intrinsics, calib: float):
    import os
    os.makedirs(out_dir, exist_ok=True)
    disp = np.load(npz_path)["disp"]
    if disp.ndim == 2:
        disp = disp[None]
    outs = []
    for t, d in enumerate(disp):
        pts, col = disparity_to_points(d, intrinsics, calib)
        out = osp.join(out_dir,
                       osp.basename(npz_path).replace(".npz", f".{t:03d}.ply"))
        write_ply(out, pts, col)
        outs.append(out)
    return outs


def _render_points(points: np.ndarray, colors: np.ndarray, intrinsics,
                   size, yaw_deg: float = 0.0) -> np.ndarray:
    """Painter's-algorithm projection of a colored point cloud to an image
    (numpy stand-in for the reference's open3d offscreen render,
    vis_point_cloud.py:76-109; far points draw first, near overwrite)."""
    W, H = size
    fx, fy, cx, cy = intrinsics
    th = np.deg2rad(yaw_deg)
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    center = np.median(points, axis=0)
    p = (points - center) @ R.T + center
    z = p[:, 2]
    ok = z > 1e-3
    p, c, z = p[ok], colors[ok], z[ok]
    xs = np.round(fx * p[:, 0] / z + cx).astype(int)
    ys = np.round(fy * p[:, 1] / z + cy).astype(int)
    ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    xs, ys, c, z = xs[ok], ys[ok], c[ok], z[ok]
    order = np.argsort(-z)  # far -> near
    img = np.zeros((H, W, 3), np.uint8)
    img[ys[order], xs[order]] = c[order]
    return img


def render_video(npz_paths, out_path: str, intrinsics, calib: float,
                 size=(960, 540), frame_rate: float = 10.0,
                 orbit_deg: float = 8.0):
    """Video mode (reference vis_point_cloud.py:76-109): render each
    frame's point cloud with a slowly orbiting camera and write an mp4 via
    cv2.VideoWriter (the same writer the reference uses)."""
    import cv2

    frames = []
    n_total = sum(np.load(f)["disp"].shape[0]
                  if np.load(f)["disp"].ndim == 3 else 1 for f in npz_paths)
    i = 0
    for f in npz_paths:
        disp = np.load(f)["disp"]
        if disp.ndim == 2:
            disp = disp[None]
        for d in disp:
            pts, col = disparity_to_points(d, intrinsics, calib)
            yaw = orbit_deg * np.sin(2 * np.pi * i / max(n_total, 1))
            frames.append(_render_points(pts, col, intrinsics, size, yaw))
            i += 1
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             frame_rate, size, isColor=True)
    for fr in frames:
        writer.write(fr[:, :, ::-1])  # RGB -> BGR
    writer.release()
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description="Export predicted disparities "
                                            "as PLY point clouds")
    p.add_argument("pattern", help="glob of .disp.pred.npz files")
    p.add_argument("--out-dir", default="point_clouds")
    p.add_argument("--intrinsics", type=float, nargs=4,
                   default=[721.54, 721.54, 621.0, 187.5])
    p.add_argument("--calib", type=float, default=384.38)
    p.add_argument("--show", action="store_true",
                   help="interactive open3d viewer (if installed)")
    p.add_argument("--video", default=None,
                   help="render an orbiting-camera mp4 of the point clouds "
                        "(reference video mode) to this path")
    p.add_argument("--frame-rate", type=float, default=10.0)
    args = p.parse_args(argv)

    files = sorted(glob.glob(args.pattern))
    if args.video and files:
        out = render_video(files, args.video, args.intrinsics, args.calib,
                           frame_rate=args.frame_rate)
        print(f"video -> {out}")
        return
    for f in files:
        outs = npz_to_ply(f, args.out_dir, args.intrinsics, args.calib)
        print(f"{f} -> {len(outs)} ply files")
    if args.show and files:
        try:
            import open3d as o3d
            pc = o3d.io.read_point_cloud(
                npz_to_ply(files[0], args.out_dir, args.intrinsics,
                           args.calib)[0])
            o3d.visualization.draw_geometries([pc])
        except ImportError:
            print("open3d not installed; PLY files written for offline viewing")


if __name__ == "__main__":
    main()
