"""Multimodal columns — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus metadata columns
(``media_type``, ``width``/``height``/``duration_ms``…). The Ray-side
plumbing — schema, actor-pool signature, small batch sizes for wide
binary rows, output layout — is real and tested; the codec itself is
STUBBED (no image/audio libraries in this container): ``DecodeStage``
raises ``NotImplementedError`` unless constructed with
``fake_decode=True``, which produces a deterministic fake decode so the
pipeline shape can be exercised end-to-end.

Scale notes baked into the design: binary rows are wide → callers
should use small ``batch_size`` (64–256) and let block size, not row
count, drive memory; decode is CPU-heavy per item → actor pool with
``num_cpus=1`` per actor and pool size ≈ cores.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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

    Plumbing is real (actor pool, binary in/out, metadata columns);
    the pixel work is stubbed: without codecs, the deterministic fake
    "resize" truncates/repeats the payload to the target byte budget
    (W×H×3) so output sizes are exactly what a real RGB resize would
    produce — downstream stages see realistic block shapes.
    """

    def __init__(self, width: int = 64, height: int = 64, fake: bool = False):
        if not fake:
            try:
                import PIL  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "no image codecs here; construct with fake=True"
                ) from e
        self.width = width
        self.height = height
        self.budget = width * height * 3

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out = [
            (p * (self.budget // max(len(p), 1) + 1))[: self.budget]
            for p in payloads
        ]
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

    Real deployments replace ``_decode_one`` with PIL/torchaudio/ffmpeg
    calls loaded once per actor in ``__init__``. Output appends
    ``decoded_ok: bool``, ``feat_dim: int32`` and ``features:
    list<float32>`` (fixed dim), preserving input columns.
    """

    FEAT_DIM = 8

    def __init__(self, fake_decode: bool = False):
        self.fake_decode = fake_decode
        if not fake_decode:
            # the import-try gate for the real codecs
            try:
                import PIL  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "no media codecs in this environment; construct with "
                    "fake_decode=True to exercise the pipeline plumbing"
                ) from e

    def _decode_one(self, payload: bytes, media_type: str) -> np.ndarray:
        if not self.fake_decode:
            raise NotImplementedError("real decode requires media codecs")
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
