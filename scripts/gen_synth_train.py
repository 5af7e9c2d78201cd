"""Generate a synthetic stereo-video training set for throughput and
learning-sanity runs (textured random scenes with geometrically-consistent
disparity: right image = left warped by the disparity field).

Usage: python scripts/gen_synth_train.py [--root DIR] [--seqs N] [--frames T]
       [--height H] [--width W]
"""
import argparse
import os

import numpy as np


def _texture(rng, H, W):
    """Multi-scale random texture so matching is well-posed."""
    img = np.zeros((H, W, 3), np.float32)
    for s in (4, 16, 64):
        low = rng.rand(H // s + 2, W // s + 2, 3).astype(np.float32)
        up = np.kron(low, np.ones((s, s, 1), np.float32))[:H, :W]
        img += up / 3.0
    return np.clip(img, 0, 1)


def _disp_field(rng, H, W, max_disp=48.0):
    """Smooth random disparity field (a few blobby layers)."""
    d = np.full((H, W), 8.0, np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for _ in range(6):
        cy, cx = rng.rand() * H, rng.rand() * W
        r = (0.1 + 0.3 * rng.rand()) * min(H, W)
        blob = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * r * r))
        d += blob * rng.uniform(4, max_disp - 10)
    return np.clip(d, 1.5, max_disp).astype(np.float32)


def _warp_right(img, disp):
    """right[x] = left[x + disp] sampled bilinearly (disp > 0 moves left)."""
    H, W, _ = img.shape
    xs = np.arange(W)[None, :] + disp  # sample coords in left image
    x0 = np.floor(xs).astype(int)
    f = (xs - x0).astype(np.float32)[..., None]
    x0c = np.clip(x0, 0, W - 1)
    x1c = np.clip(x0 + 1, 0, W - 1)
    rows = np.arange(H)[:, None]
    return img[rows, x0c] * (1 - f) + img[rows, x1c] * f


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/synth_train")
    p.add_argument("--seqs", type=int, default=4)
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=576)
    args = p.parse_args()

    import imageio.v2 as imageio

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from codd_tpu.data import io as dio

    rng = np.random.RandomState(0)
    H, W = args.height, args.width
    lines = []
    for s in range(args.seqs):
        base = _texture(rng, H, W + 64)
        disp = _disp_field(rng, H, W)
        for t in range(args.frames):
            shift = t * 2
            left = base[:, shift:shift + W]
            right = _warp_right(left, disp)
            for side, img in (("left", left), ("right", right)):
                d = os.path.join(args.root, side, f"s{s}")
                os.makedirs(d, exist_ok=True)
                imageio.imwrite(os.path.join(d, f"{t:04d}.png"),
                                (img * 255).astype(np.uint8))
            dd = os.path.join(args.root, "disp", f"s{s}")
            os.makedirs(dd, exist_ok=True)
            dio.write_pfm(os.path.join(dd, f"{t:04d}.pfm"), disp)
            fd = os.path.join(args.root, "flow", f"s{s}")
            os.makedirs(fd, exist_ok=True)
            flow = np.zeros((H, W, 3), np.float32)
            flow[..., 0] = -2.0  # constant camera pan
            dio.write_pfm(os.path.join(fd, f"{t:04d}.pfm"), flow)
            lines.append(" ".join([
                f"left/s{s}/{t:04d}.png", f"right/s{s}/{t:04d}.png",
                f"disp/s{s}/{t:04d}.pfm", f"flow/s{s}/{t:04d}.pfm"]))
    with open(os.path.join(args.root, "split.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.seqs * args.frames} frames under {args.root}")


if __name__ == "__main__":
    main()
