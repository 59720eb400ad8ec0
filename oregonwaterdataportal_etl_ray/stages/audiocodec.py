"""Pure numpy WAV (RIFF PCM + IMA ADPCM) codec + audio feature stage.

Like :mod:`.imagecodec`, this makes the audio leg of the multimodal battery
REAL without external libraries: canonical RIFF/WAVE PCM (8-bit unsigned /
16-bit signed) decodes with one header parse + one ``frombuffer`` reshape,
and IMA ADPCM (format 0x11, the classic 4-bit COMPRESSED wav codec; spec
public in the IMA Digital Audio Compatibility Project docs) decodes
vectorized ACROSS blocks — every ADPCM block opens with a full predictor
sample + step index, so blocks are independent and the only sequential loop
is the within-block sample recurrence (numpy ops over all blocks at each
step). Perceptual formats (mp3/ogg/...) stay stubbed — plug ffmpeg into the
same stage shape in deployment.
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


def _parse_wav(payload: bytes) -> tuple[tuple, bytes, int | None]:
    """RIFF walk -> (validated fmt tuple, data chunk, fact sample count)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data, n_fact = 12, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"fact" and length >= 4:
            (n_fact,) = struct.unpack_from("<I", body, 0)
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)        # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if channels < 1 or sample_rate < 1:
        raise ValueError(
            f"corrupt WAV fmt chunk (channels={channels}, rate={sample_rate})")
    if audio_format == 0x11:
        if channels != 1 or bits != 4:
            raise NotImplementedError(
                f"IMA ADPCM: mono 4-bit only (channels={channels}, bits={bits})")
        if block_align < 8:
            raise ValueError(f"corrupt ADPCM block_align={block_align}")
    elif audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only PCM 8/16-bit or IMA-ADPCM WAV supported "
            f"(format={audio_format}, bits={bits})")
    return fmt, data, n_fact


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM / IMA-ADPCM WAV bytes -> ((N, C) float32 in [-1, 1], rate)."""
    fmt, data, n_fact = _parse_wav(payload)
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format == 0x11:                     # IMA ADPCM (compressed)
        s = _adpcm_decode_blocks(data, block_align)
        if n_fact is not None:
            s = s[:n_fact]
        return (s.astype(np.float32) / 32768.0)[:, None], sample_rate
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    n = len(x) // channels
    return x[:n * channels].reshape(n, channels), sample_rate


# ---------------------------------------------------------------------------
# IMA ADPCM (WAVE format 0x11) — real compressed-audio path
# ---------------------------------------------------------------------------

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, np.int32)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767], np.int32)


def _adpcm_decode_blocks(data: bytes, block_align: int) -> np.ndarray:
    """Mono IMA ADPCM data chunk -> int16 samples, vectorized across blocks.

    Each ``block_align``-byte block is self-contained (4-byte header =
    initial int16 sample + step index), so all blocks decode in lockstep:
    the loop below runs once per WITHIN-block sample position, operating on
    a whole (n_blocks,)-vector per step."""
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return np.empty(0, np.int16)
    blk = np.frombuffer(data[:n_blocks * block_align],
                        np.uint8).reshape(n_blocks, block_align)
    pred = blk[:, :2].copy().view("<i2")[:, 0].astype(np.int32)
    index = np.clip(blk[:, 2].astype(np.int32), 0, 88)
    body = blk[:, 4:]
    # low nibble first, per the WAV layout
    nib = np.empty((n_blocks, body.shape[1] * 2), np.uint8)
    nib[:, 0::2] = body & 0x0F
    nib[:, 1::2] = body >> 4
    spb = nib.shape[1] + 1
    out = np.empty((n_blocks, spb), np.int16)
    out[:, 0] = pred
    for i in range(spb - 1):
        delta = nib[:, i]
        step = _IMA_STEP[index]
        diff = (step >> 3) + np.where(delta & 4, step, 0) \
            + np.where(delta & 2, step >> 1, 0) \
            + np.where(delta & 1, step >> 2, 0)
        pred = np.clip(np.where(delta & 8, pred - diff, pred + diff),
                       -32768, 32767)
        index = np.clip(index + _IMA_INDEX[delta], 0, 88)
        out[:, i + 1] = pred
    return out.reshape(-1)


def _ima_quantize_blocks(x2d: np.ndarray, pred0: np.ndarray,
                         index0: np.ndarray) -> np.ndarray:
    """Standard IMA ADPCM quantizer (public spec), vectorized ACROSS blocks
    exactly like the decoder: blocks are independent (each header carries
    its own predictor + step index), so the only sequential loop is the
    within-block sample position, running numpy ops over all blocks at
    each step. Shift-subtract nibble selection; the predictor advances
    with the decoder's EXACT reconstruction, keeping encode and decode in
    lockstep."""
    n_blocks, m = x2d.shape
    nib = np.empty((n_blocks, m), np.uint8)
    pred = pred0.astype(np.int32).copy()
    index = index0.astype(np.int32).copy()
    for i in range(m):
        step = _IMA_STEP[index]
        diff = x2d[:, i] - pred
        neg = diff < 0
        d = np.abs(diff)
        b4 = d >= step
        d = d - np.where(b4, step, 0)
        h = step >> 1
        b2 = d >= h
        d = d - np.where(b2, h, 0)
        q = step >> 2
        b1 = d >= q
        n = ((neg.astype(np.uint8) << 3) | (b4.astype(np.uint8) << 2)
             | (b2.astype(np.uint8) << 1) | b1.astype(np.uint8))
        recon = (step >> 3) + np.where(b4, step, 0) \
            + np.where(b2, h, 0) + np.where(b1, q, 0)
        pred = np.clip(np.where(neg, pred - recon, pred + recon),
                       -32768, 32767)
        index = np.clip(index + _IMA_INDEX[n], 0, 88)
        nib[:, i] = n
    return nib


def encode_adpcm_wav(samples: np.ndarray, sample_rate: int = 16_000,
                     block_align: int = 256) -> bytes:
    """(N,) int16 mono -> IMA ADPCM WAV bytes (format 0x11). One-payload
    convenience wrapper over :func:`encode_adpcm_wavs`."""
    return encode_adpcm_wavs([samples], [sample_rate], block_align)[0]


def encode_adpcm_wavs(samples_list: list[np.ndarray],
                      sample_rates: list[int],
                      block_align: int = 256) -> list[bytes]:
    """Encode MANY int16 mono waveforms to IMA ADPCM WAVs in one quantizer
    pass: every payload's blocks concatenate into a single (total_blocks,
    samples_per_block) matrix, so the within-block recurrence runs numpy
    ops over ALL payloads' blocks at once — batching across payloads is
    what makes the pure-numpy encoder fast when each payload holds only a
    few blocks (stdlib ``audioop`` is removed in Python 3.13, PEP 594).

    Blocks are encoded independently; each header carries its own
    predictor plus a step index seeded from the block's mean |delta| (a
    reset-to-0 index slope-overloads for dozens of samples on loud
    signals; the signal-matched seed adapts instantly — standard encoder
    practice, and the decoder follows the header). Low-nibble-first WAV
    layout."""
    spb = (block_align - 4) * 2 + 1
    counts, chunks = [], []
    for s in samples_list:
        assert s.ndim == 1 and s.dtype == np.int16
        nb = max(1, -(-len(s) // spb))
        counts.append(nb)
        p = np.zeros(nb * spb, np.int16)
        p[:len(s)] = s
        chunks.append(p.reshape(nb, spb))
    x2d = np.concatenate(chunks).astype(np.int32)
    mad = np.abs(np.diff(x2d, axis=1)).mean(axis=1).astype(np.int64)
    idx0 = np.clip(np.searchsorted(_IMA_STEP, np.maximum(mad, 1)), 0, 88)
    nib = _ima_quantize_blocks(x2d[:, 1:], x2d[:, 0], idx0)
    packed = (nib[:, 0::2] | (nib[:, 1::2] << 4)).astype(np.uint8)
    heads = np.zeros((len(x2d), 4), np.uint8)
    heads[:, :2] = x2d[:, 0].astype("<i2")[:, None].view(np.uint8)
    heads[:, 2] = idx0.astype(np.uint8)
    blocks = np.concatenate([heads, packed], axis=1)

    out, at = [], 0
    for s, rate, nb in zip(samples_list, sample_rates, counts):
        data = blocks[at:at + nb].tobytes()
        at += nb
        n = len(s)
        byte_rate = (rate * block_align) // spb + 1
        hdr = (b"RIFF" + struct.pack("<I", 52 + len(data)) + b"WAVE" +
               b"fmt " + struct.pack("<IHHIIHHHH", 20, 0x11, 1, rate,
                                     byte_rate, block_align, 4, 2, spb) +
               b"fact" + struct.pack("<II", 4, n) +
               b"data" + struct.pack("<I", len(data)))
        out.append(hdr + data)
    return out



class AudioFeatures(_PayloadFeatureStage):
    """map_batches stage: WAV payload column -> (duration_s, sample_rate,
    channels, rms). Error policy and output layout come from the shared
    :class:`PayloadFeatureStage` skeleton; ``__call__`` is overridden to
    decode ADPCM payloads BATCHED — a typical payload holds only a few
    compressed blocks, so the per-position recurrence over one payload runs
    numpy ops on tiny vectors. Concatenating every ADPCM payload's blocks
    in the batch (grouped by block_align) into one matrix runs the same
    recurrence once over hundreds of blocks, then splits per payload."""

    FEATURES = {"duration_s": pa.float64(), "sample_rate": pa.int32(),
                "channels": pa.int32(), "rms": pa.float64()}

    def _features(self, payload: bytes) -> tuple:
        x, rate = decode_wav(payload)
        rms = float(np.sqrt(np.mean(np.square(x)))) if len(x) else 0.0
        return (len(x) / rate, rate, x.shape[1], rms)

    @staticmethod
    def _pcm_features(fmt: tuple, data: bytes) -> tuple:
        """PCM features from an ALREADY-PARSED payload — __call__ has the
        (fmt, data) in hand, so re-walking the RIFF via decode_wav would
        parse every PCM payload twice on the hot path."""
        _, channels, sample_rate, _, _, bits = fmt
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        else:
            x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
        n = len(x) // channels
        x = x[:n * channels]
        rms = float(np.sqrt(np.mean(np.square(x)))) if len(x) else 0.0
        return (n / sample_rate, sample_rate, channels, rms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats: list[tuple | None] = [None] * len(payloads)
        # (block_align) -> [(row, data, n_fact, rate)]
        adpcm_groups: dict[int, list] = {}
        for i, p in enumerate(payloads):
            try:
                fmt, data, n_fact = _parse_wav(p or b"")
                if fmt[0] == 0x11:
                    adpcm_groups.setdefault(fmt[4], []).append(
                        (i, data, n_fact, fmt[2]))
                else:
                    feats[i] = self._pcm_features(fmt, data)
            except Exception:
                if self.on_error == "raise":
                    raise
                feats[i] = (None,) * len(self.FEATURES)
        for ba, items in adpcm_groups.items():
            counts = [len(d) // ba for _, d, _, _ in items]
            joined = b"".join(d[:c * ba] for (_, d, _, _), c
                              in zip(items, counts))
            all_s = _adpcm_decode_blocks(joined, ba)
            spb = (ba - 4) * 2 + 1
            bounds = np.concatenate(([0], np.cumsum(counts))) * spb
            for (row, _d, n_fact, rate), lo, hi in zip(items, bounds,
                                                       bounds[1:]):
                s = all_s[lo:hi]
                if n_fact is not None:
                    s = s[:n_fact]
                x = s.astype(np.float32) / 32768.0
                rms = float(np.sqrt(np.mean(np.square(x)))) if len(x) else 0.0
                feats[row] = (len(x) / rate, rate, 1, rms)
        out = batch
        for j, (name, typ) in enumerate(self.FEATURES.items()):
            out = out.append_column(
                name, pa.array([f[j] for f in feats], typ))
        if self.drop_payload:
            out = out.drop_columns([self.payload_col])
        return out
