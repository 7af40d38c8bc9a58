"""Pure-numpy image codec for UNCOMPRESSED formats.

This container has no image libraries, but netpbm (PPM/PGM) and
uncompressed 24-bit BMP are plain byte layouts — a real decoder needs
only header parsing plus ``np.frombuffer``. This upgrades the
multimodal pipeline from "codec stubbed" to REAL decode / resize /
feature extraction for these formats; compressed formats (PNG/JPEG)
remain gated behind the import-try in ``multimodal.DecodeStage``.

All functions are deterministic and vectorized:

- ``decode_image(buf)``: sniffs magic bytes (``P6``/``P5``/``BM``) and
  returns an (H, W, 3) uint8 RGB array.
- ``encode_ppm`` / ``encode_bmp``: inverse, for fixtures and re-encode
  after resize.
- ``resize_nearest(arr, w, h)``: real nearest-neighbor resampling via
  numpy index mapping.
- ``image_features(arr)``: 8 real features (per-channel mean/std,
  aspect ratio, mean luminance) — the brute-ANN-compatible embedding.
"""

from __future__ import annotations

import numpy as np


def _pnm_header(buf: bytes):
    """Parse a netpbm header: magic, then whitespace/comment-separated
    width, height, maxval; returns (magic, w, h, maxval, data_offset)."""
    magic = buf[:2].decode("ascii", "replace")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and '#' comments
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    return magic, vals[0], vals[1], vals[2], pos


def decode_ppm(buf: bytes) -> np.ndarray:
    """P6 (binary RGB) / P5 (binary grayscale) → (H, W, 3) uint8."""
    magic, w, h, maxval, off = _pnm_header(buf)
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    if magic == "P6":
        arr = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=off)
        return arr.reshape(h, w, 3).copy()
    if magic == "P5":
        g = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=off)
        return np.repeat(g.reshape(h, w, 1), 3, axis=2)
    raise ValueError(f"not a binary netpbm payload: {magic!r}")


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr[:, :, :3], dtype=np.uint8
    ).tobytes()


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB bottom-up BMP → (H, W, 3) uint8 RGB."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * abs(h), offset=off
    ).reshape(abs(h), stride)[:, : w * 3]
    img = rows.reshape(abs(h), w, 3)[:, :, ::-1]  # BGR → RGB
    if h > 0:
        img = img[::-1]  # bottom-up
    return img.copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    bgr = np.ascontiguousarray(arr[:, :, :3][:, :, ::-1], dtype=np.uint8)
    body[:, : w * 3] = bgr.reshape(h, w * 3)
    body = body[::-1].tobytes()  # bottom-up
    header = (
        b"BM"
        + (14 + 40 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (14 + 40).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + body


def decode_image(buf: bytes) -> np.ndarray:
    """Magic-byte dispatch over the supported uncompressed formats."""
    if buf[:2] in (b"P6", b"P5"):
        return decode_ppm(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    raise ValueError(
        "unsupported payload (only uncompressed PPM/PGM/BMP decode "
        "without codec libraries)"
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Real nearest-neighbor resize via index mapping (pixel-center
    convention), any scale factor."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(
        np.int64
    )
    xi = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(
        np.int64
    )
    return arr[yi][:, xi]


def image_features(arr: np.ndarray) -> np.ndarray:
    """8 deterministic real features: per-channel mean and std (6),
    aspect ratio, mean luminance — all in [0, 1]-ish float32."""
    f = arr.astype(np.float32) / 255.0
    means = f.mean(axis=(0, 1))
    stds = f.std(axis=(0, 1))
    aspect = np.float32(arr.shape[1] / max(arr.shape[0], 1))
    lum = np.float32(
        0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2]
    )
    return np.concatenate(
        [means, stds, [aspect, lum]]
    ).astype(np.float32)


def synth_image(media_id: int, *, width: int = 32, height: int = 24) -> np.ndarray:
    """Deterministic test image: per-id phase-shifted gradients."""
    y, x = np.mgrid[0:height, 0:width]
    r = (x * 255 // max(width - 1, 1) + media_id * 37) % 256
    g = (y * 255 // max(height - 1, 1) + media_id * 101) % 256
    b = ((x + y) * 7 + media_id) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)
