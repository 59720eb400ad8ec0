"""Pure numpy WAV (RIFF PCM) codec + audio feature stage.

Like :mod:`.imagecodec`, this makes the audio leg of the multimodal battery
REAL without external libraries: canonical RIFF/WAVE PCM (8-bit unsigned /
16-bit signed) decodes with one header parse + one ``frombuffer`` reshape.
Compressed formats (mp3/ogg/...) stay stubbed — plug ffmpeg into the same
stage shape in deployment.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .multimodal import PayloadFeatureStage as _PayloadFeatureStage


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(N,) or (N, C) int16 -> canonical PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    assert samples.dtype == np.int16
    n, c = samples.shape
    data = samples.reshape(-1).tobytes()
    byte_rate = sample_rate * c * 2
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" +
           b"fmt " + struct.pack("<IHHIIHH", 16, 1, c, sample_rate,
                                 byte_rate, c * 2, 16) +
           b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> ((N, C) float32 in [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)        # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only PCM 8/16-bit WAV supported (format={audio_format}, bits={bits})")
    if channels < 1 or sample_rate < 1:
        raise ValueError(
            f"corrupt WAV fmt chunk (channels={channels}, rate={sample_rate})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    n = len(x) // channels
    return x[:n * channels].reshape(n, channels), sample_rate


class AudioFeatures(_PayloadFeatureStage):
    """map_batches stage: WAV payload column -> (duration_s, sample_rate,
    channels, rms). Loop, raise-or-null error policy, and drop-payload-early
    rule come from the shared :class:`PayloadFeatureStage` skeleton."""

    FEATURES = {"duration_s": pa.float64(), "sample_rate": pa.int32(),
                "channels": pa.int32(), "rms": pa.float64()}

    def _features(self, payload: bytes) -> tuple:
        x, rate = decode_wav(payload)
        rms = float(np.sqrt(np.mean(np.square(x)))) if len(x) else 0.0
        return (len(x) / rate, rate, x.shape[1], rms)
