"""Pure-numpy audio codec for UNCOMPRESSED WAV (RIFF PCM).

The audio sibling of ``imagecodec``: PCM WAV is a plain byte layout —
RIFF header, ``fmt `` chunk, ``data`` chunk — so a real decoder needs
only chunk walking plus ``np.frombuffer``. 16-bit and 8-bit PCM
supported; compressed audio (MP3/OGG/AAC) still needs codec libraries
and stays behind the multimodal import-try gate.
"""

from __future__ import annotations

import numpy as np


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV → (samples float32 in [-1, 1] shaped (n, channels),
    sample_rate). Walks chunks — extra chunks (LIST, fact) are
    skipped like any real reader."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError(f"only PCM WAV (format 1), got {audio_format}")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    else:
        raise ValueError(f"unsupported PCM width: {bits}")
    n = len(x) // max(channels, 1)
    return x[: n * channels].reshape(n, channels), rate


def encode_wav(
    samples: np.ndarray, rate: int = 16000
) -> bytes:
    """(n, channels) float32 in [-1, 1] → 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    data = pcm.tobytes()
    channels = samples.shape[1]
    byte_rate = rate * channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """8 deterministic real features from the PCM signal: duration_s,
    RMS, peak, zero-crossing rate, mean, std, channel count, and
    sample rate in kHz — float32."""
    mono = samples.mean(axis=1)
    n = max(len(mono), 1)
    zc = (
        float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        / n
    )
    return np.asarray(
        [
            n / float(rate),
            float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0,
            float(np.abs(mono).max()) if len(mono) else 0.0,
            zc,
            float(mono.mean()) if len(mono) else 0.0,
            float(mono.std()) if len(mono) else 0.0,
            float(samples.shape[1]),
            rate / 1000.0,
        ],
        dtype=np.float32,
    )


def synth_tone(
    media_id: int, *, rate: int = 8000, ms: int = 50
) -> np.ndarray:
    """Deterministic test signal: per-id frequency sine + harmonic."""
    n = rate * ms // 1000
    t = np.arange(n, dtype=np.float32) / rate
    f0 = 220.0 + (media_id % 16) * 55.0
    return (
        0.6 * np.sin(2 * np.pi * f0 * t)
        + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)
    ).astype(np.float32)[:, None]
