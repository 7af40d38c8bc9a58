"""Multimodal columns — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…). The Ray-side
plumbing — schema, actor-pool signature, small batch sizes for wide
binary rows, output layout — is real and tested. The codec tier:
UNCOMPRESSED image formats (PPM/PGM/BMP) decode / resize / featurize
for REAL via the pure-numpy ``stages.imagecodec`` — including
non-interlaced 8-bit PNG (stdlib zlib); remaining compressed formats
(JPEG/video/compressed-audio) still need codec libraries absent here — those raise ``NotImplementedError`` per payload unless
``fake_decode=True`` substitutes a deterministic fake.

Scale notes baked into the design: binary rows are wide → callers
should use small ``batch_size`` (64–256) and let block size, not row
count, drive memory; decode is CPU-heavy per item → actor pool with
``num_cpus=1`` per actor and pool size ≈ cores.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# module-level, NOT function-body: workers resolve this package only
# via pickle-by-value
from .audiocodec import audio_features, decode_wav
from .imagecodec import (
    decode_image,
    encode_ppm,
    image_features,
    resize_nearest,
)

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # "image/png", "audio/wav", ...
        pa.field("payload", pa.binary()),
        pa.field("meta_json", pa.string()),
    ]
)


def synth_media_table(n: int, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    ids = np.arange(n, dtype=np.int64)
    types = np.where(ids % 3 == 0, "audio/wav", "image/png").astype(object)
    payloads = [
        hashlib.sha256(f"media-{i}".encode()).digest()
        * (payload_bytes // 32 + 1)
        for i in ids
    ]
    payloads = [p[:payload_bytes] for p in payloads]
    metas = [f'{{"idx": {int(i)}}}' for i in ids]
    return pa.Table.from_arrays(
        [
            pa.array(ids),
            pa.array(types, type=pa.string()),
            pa.array(payloads, type=pa.binary()),
            pa.array(metas, type=pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


class ResizeStage:
    """Image-resize actor stage: payload → resized payload + dims.

    Native payloads (PPM/PGM/BMP/PNG) take the REAL path: decode →
    nearest-neighbor resample → re-encode as PPM. Other formats fall
    back to the deterministic fake (payload truncated/repeated to the
    W×H×3 byte budget) when ``fake=True``, else raise per payload.
    """

    def __init__(self, width: int = 64, height: int = 64, fake: bool = False):
        self.fake = fake
        self.width = width
        self.height = height
        self.budget = width * height * 3

    def _resize_one(self, p: bytes) -> bytes:
        try:
            img = decode_image(p)
        except ValueError:
            if self.fake:
                return (p * (self.budget // max(len(p), 1) + 1))[: self.budget]
            raise NotImplementedError(
                "this media format needs codec libraries; "
                "PPM/PGM/BMP/non-interlaced-PNG resize natively"
            )
        return encode_ppm(resize_nearest(img, self.width, self.height))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out = [self._resize_one(p) for p in payloads]
        n = len(batch)
        return (
            batch.set_column(
                batch.column_names.index("payload"),
                "payload",
                pa.array(out, type=pa.binary()),
            )
            .append_column(
                "width", pa.array(np.full(n, self.width, dtype=np.int32))
            )
            .append_column(
                "height", pa.array(np.full(n, self.height, dtype=np.int32))
            )
        )


class FrameSampleStage:
    """Video frame-sampling actor stage: one payload → N frame rows
    (flat_map shape expressed as a batch transform: output has more
    rows than input, one per sampled frame).

    Frame extraction is stubbed deterministically (frame i = the
    payload's bytes rotated by i); the row-explosion plumbing —
    (media_id, frame_idx, frame_payload) with small batch sizes for
    wide rows — is the real, tested part.
    """

    def __init__(self, frames: int = 4, fake: bool = False):
        if not fake:
            try:
                import PIL  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "no video codecs here; construct with fake=True"
                ) from e
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_idx, out_frame = [], [], []
        for mid, p in zip(ids, payloads):
            for i in range(self.frames):
                out_id.append(mid)
                out_idx.append(i)
                out_frame.append(p[i:] + p[:i])
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "frame_payload": pa.array(out_frame, type=pa.binary()),
            }
        )


class DecodeStage:
    """Actor-pool decode: payload → feature columns.

    Native image payloads (PPM/PGM/BMP/PNG) decode for REAL — the
    features are per-channel mean/std + aspect + luminance from
    ``imagecodec.image_features``. Compressed formats need codec
    libraries (PIL/torchaudio/ffmpeg, loaded once per actor in real
    deployments); without them each such payload raises unless
    ``fake_decode=True`` substitutes the digest fake. Output appends
    ``decoded_ok: bool``, ``feat_dim: int32`` and ``features:
    list<float32>`` (fixed dim), preserving input columns.
    """

    FEAT_DIM = 8

    def __init__(self, fake_decode: bool = False):
        self.fake_decode = fake_decode

    def _decode_one(self, payload: bytes, media_type: str) -> np.ndarray:
        try:
            return image_features(decode_image(payload))
        except ValueError:
            pass
        try:
            return audio_features(*decode_wav(payload))
        except ValueError:
            pass
        if not self.fake_decode:
            raise NotImplementedError(
                "this media format needs codec libraries; "
                "PPM/PGM/BMP/non-interlaced-PNG images and PCM WAV "
                "audio decode natively"
            )
        # deterministic fake: 8 floats from the payload digest
        d = hashlib.sha256(payload).digest()
        return (
            np.frombuffer(d[: self.FEAT_DIM * 4], dtype=np.uint32).astype(
                np.float32
            )
            / np.float32(2**32)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        if not payloads:
            feats = np.empty((0, self.FEAT_DIM), dtype=np.float32)
        else:
            feats = np.stack(
                [self._decode_one(p, t) for p, t in zip(payloads, types)]
            )
        features = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), type=pa.float32()), self.FEAT_DIM
        )
        ok = pa.array(np.ones(len(batch), dtype=bool))
        dim = pa.array(
            np.full(len(batch), self.FEAT_DIM, dtype=np.int32), type=pa.int32()
        )
        return (
            batch.append_column("decoded_ok", ok)
            .append_column("feat_dim", dim)
            .append_column("features", features)
        )
