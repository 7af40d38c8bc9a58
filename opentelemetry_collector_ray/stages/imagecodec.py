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

# module-level, NOT function-body: decode_image runs on workers, which
# resolve this package only via pickle-by-value (CLAUDE.md)
from .jpegcodec import decode_jpeg


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


# ------------------------------------------------------------------ PNG
# stdlib zlib makes PNG decodable without codec libraries: the format
# is chunks (len/type/data/crc32) around a zlib stream of per-row
# filtered scanlines. Real pixel math, not a stub — covers the
# non-interlaced 8-bit color types (gray / gray+alpha / RGB / RGBA).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colortype → samples per pixel (bitdepth 8)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(buf: bytes):
    pos = len(_PNG_SIG)
    while pos + 8 <= len(buf):
        n = int.from_bytes(buf[pos : pos + 4], "big")
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + n]
        yield ctype, data
        pos += 12 + n  # len + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter_scanlines(raw: np.ndarray, h: int, stride: int, bpp: int):
    """Reverse the per-row PNG filters. Rows are (filter_byte, bytes);
    Up/None/Average are vectorized per row; Sub is a per-byte-lane
    cumulative sum; Paeth falls back to a per-pixel walk (rare in our
    own encodes — we write filter 0 — but real-world PNGs use it)."""
    rows = raw.reshape(h, 1 + stride)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: cumsum per byte lane
            lanes = cur.reshape(-1, bpp)
            rec = np.cumsum(lanes, axis=0).reshape(-1)
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 3:  # Average — sequential in x via lane recurrence
            # each reconstructed byte must be masked to mod-256 BEFORE
            # it feeds the next pixel's predictor (PNG spec 9.2)
            rec = np.zeros(stride, np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                rec[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth predictor — sequential in x
            rec = np.zeros(stride, np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG → (H, W, 3) uint8 RGB (alpha dropped,
    grayscale broadcast — same output contract as the other decoders)."""
    import zlib

    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    w = h = None
    colortype = None
    idat = []
    for ctype, data in _png_chunks(buf):
        if ctype == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bitdepth, colortype, _comp, _filt, interlace = data[8:13]
            if bitdepth != 8:
                raise ValueError(f"only 8-bit PNG (got bitdepth={bitdepth})")
            if colortype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG colortype {colortype}")
            if interlace:
                raise ValueError("interlaced (Adam7) PNG unsupported")
        elif ctype == b"IDAT":
            idat.append(data)
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _PNG_CHANNELS[colortype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline data length mismatch")
    px = _unfilter_scanlines(raw, h, stride, ch).reshape(h, w, ch)
    if colortype == 2:
        return px.copy()
    if colortype == 6:
        return px[:, :, :3].copy()
    if colortype == 0:
        return np.repeat(px, 3, axis=2)
    return np.repeat(px[:, :, :1], 3, axis=2)  # gray+alpha


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 3|4) uint8 → non-interlaced 8-bit RGB/RGBA PNG (filter 0
    rows — decoders must accept all filters; encoders may pick any)."""
    import zlib

    h, w = arr.shape[:2]
    ch = 4 if arr.ndim == 3 and arr.shape[2] == 4 else 3
    colortype = 6 if ch == 4 else 2
    body = np.ascontiguousarray(arr[:, :, :ch], dtype=np.uint8).reshape(
        h, w * ch
    )
    scan = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    scan[:, 1:] = body
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, colortype, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_image(buf: bytes) -> np.ndarray:
    """Magic-byte dispatch over the supported formats."""
    if buf[:2] in (b"P6", b"P5"):
        return decode_ppm(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf.startswith(_PNG_SIG):
        return decode_png(buf)
    if buf[:2] == b"\xff\xd8":
        try:
            return decode_jpeg(buf)
        except ValueError as e:
            # non-baseline (progressive/12-bit/multi-scan) stays an
            # honest per-payload gate, never a wrong decode
            raise ValueError(f"JPEG variant unsupported: {e}") from e
    raise ValueError(
        "unsupported payload (PPM/PGM/BMP/non-interlaced-PNG/baseline-"
        "JPEG decode without codec libraries)"
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
