"""Native C++ codec: build, decode parity with imageio/numpy codecs."""

import numpy as np
import pytest

from codd_tpu.data import io as dio
from codd_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.native_available():
        pytest.skip("native codec library unavailable (g++/zlib missing)")
    return True


def test_native_pfm(lib_ok, tmp_path):
    rng = np.random.RandomState(0)
    data = rng.rand(9, 7).astype(np.float32) * 100
    p = str(tmp_path / "x.pfm")
    dio.write_pfm(p, data)
    out = native.decode(p)
    np.testing.assert_allclose(out, data, atol=1e-6)


def test_native_flo(lib_ok, tmp_path):
    rng = np.random.RandomState(1)
    flow = rng.randn(6, 5, 2).astype(np.float32)
    p = str(tmp_path / "x.flo")
    dio.write_flo(p, flow)
    np.testing.assert_allclose(native.decode(p), flow, atol=1e-6)


def _write_png(path, img):
    """Minimal PNG encoder (filter 0, no interlace) — exists because PIL
    cannot write 16-bit RGB PNGs (the KITTI flow format)."""
    import struct
    import zlib

    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    depth = 16 if img.dtype == np.uint16 else 8
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b""
    arr = img.reshape(h, -1)
    for row in arr:
        raw += b"\x00" + (row.astype(">u2" if depth == 16 else "u1").tobytes())

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype,
                                           0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


@pytest.mark.parametrize("dtype,channels", [
    (np.uint8, 3), (np.uint8, 1), (np.uint16, 1), (np.uint16, 3),
])
def test_native_png_roundtrip(lib_ok, tmp_path, dtype, channels):
    rng = np.random.RandomState(2)
    hi = 255 if dtype == np.uint8 else 65535
    shape = (11, 13) if channels == 1 else (11, 13, channels)
    img = rng.randint(0, hi + 1, size=shape).astype(dtype)
    p = str(tmp_path / "x.png")
    _write_png(p, img)
    out = native.decode(p)
    assert out is not None
    np.testing.assert_allclose(out, img.astype(np.float32), atol=0)


def test_native_png_matches_imageio_8bit(lib_ok, tmp_path):
    import imageio.v2 as imageio
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(10, 12, 3)).astype(np.uint8)
    p = str(tmp_path / "y.png")
    imageio.imwrite(p, img)  # PIL writes with real filters; exercises unfilter
    ref = np.asarray(imageio.imread(p)).astype(np.float32)
    out = native.decode(p)
    np.testing.assert_allclose(out, ref, atol=0)


def test_native_batch_decode(lib_ok, tmp_path):
    import imageio.v2 as imageio
    rng = np.random.RandomState(3)
    paths = []
    refs = []
    for i in range(6):
        img = rng.randint(0, 256, size=(8, 9, 3)).astype(np.uint8)
        p = str(tmp_path / f"{i}.png")
        imageio.imwrite(p, img)
        paths.append(p)
        refs.append(img)
    outs = native.decode_batch(paths, num_threads=3)
    assert outs is not None
    for out, ref in zip(outs, refs):
        np.testing.assert_allclose(out, ref.astype(np.float32))
