"""Multimodal (image/audio/video) stages — opaque binary columns + typed metadata.

Image decode is REAL for BMP (BI_RGB 24-bit), PNG (8-bit gray/RGB/RGBA,
filters None/Sub/Up vectorized, Average/Paeth per-scanline) via the
pure-numpy+zlib codec in :mod:`.imagecodec`, and baseline JPEG (sequential
DCT incl. chroma subsampling + restart intervals, :mod:`.jpegcodec`) — no
external image libraries needed. ``ImageDecoder`` sniffs the magic bytes and
emits (height, width, channels, mean_intensity). Video is REAL for
MJPEG-in-AVI (:mod:`.videocodec` container parse + per-frame baseline JPEG,
driven by ``MjpegFrameSampler``) and compressed audio for IMA-ADPCM WAV
(:mod:`.audiocodec`). Formats without a pure-python decoder here
(progressive JPEG, inter-frame video codecs, MP3/AAC) remain STUBBED:
``FakeDecoder``/``FrameSampler`` produce
deterministic pseudo-features so the Ray-side plumbing — schema, small
batch sizes for large payloads, actor-pool signature, output layout — is
real and tested; swap in PIL/ffmpeg in deployment, nothing else changes.

Design notes for 100 TB of media:
  - payloads are ``large_binary`` columns; blocks must stay size-bounded, so
    these stages are meant to run with small ``batch_size`` (e.g. 32) and
    ``DataContext.target_max_block_size`` tuned down;
  - decode/feature stages are actor pools (codec init once per actor);
  - outputs keep (id, metadata, feature) and DROP the raw payload as early
    as possible so the object store holds features, not media.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class PayloadStats:
    """Cheap metadata pass: byte size + content digest of a binary column."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from ..functions.kernels import md5_hex
        col = batch[self.payload_col]
        sizes = pc.cast(pc.fill_null(pc.binary_length(col), 0), pa.int64())
        digests = md5_hex(col)  # zero-copy memoryview digests, one pass
        out = batch.append_column("payload_bytes", sizes)
        return out.append_column("payload_md5", digests)


class FakeDecoder:
    """STUB image decode -> (height, width, mean_intensity) features.

    Deterministic: features derive from the payload's md5, so tests are
    stable. A real deployment replaces ``_decode`` with e.g. PIL.Image.open;
    raise NotImplementedError there if no codec is available."""

    def __init__(self, payload_col: str = "payload", drop_payload: bool = True):
        self.payload_col = payload_col
        self.drop_payload = drop_payload

    def _decode(self, payload: bytes) -> tuple[int, int, float]:
        d = hashlib.md5(payload).digest()
        h = 16 + d[0] % 64
        w = 16 + d[1] % 64
        mean = d[2] / 255.0
        return h, w, mean

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(v or b"") for v in batch[self.payload_col].to_pylist()]
        out = batch
        out = out.append_column("height", pa.array([f[0] for f in feats], pa.int32()))
        out = out.append_column("width", pa.array([f[1] for f in feats], pa.int32()))
        out = out.append_column("mean_intensity",
                                pa.array([f[2] for f in feats], pa.float64()))
        if self.drop_payload:
            out = out.drop_columns([self.payload_col])
        return out


class PayloadFeatureStage:
    """Shared skeleton for payload-column feature stages: the per-row decode
    loop, the raise-or-null error policy, the typed output columns, and the
    drop-payload-early rule live HERE once — subclasses supply ``FEATURES``
    (name -> Arrow type) and ``_features(payload) -> tuple``.

    A corrupt payload in ``on_error='null'`` mode yields null features for
    that row only (tolerant-crawl semantics); ANY exception from the decode
    counts as corrupt — a crawl's garbage is not enumerable up front."""

    FEATURES: dict = {}

    def __init__(self, payload_col: str = "payload", drop_payload: bool = True,
                 on_error: str = "raise"):
        self.payload_col = payload_col
        self.drop_payload = drop_payload
        self.on_error = on_error

    def _features(self, payload: bytes) -> tuple:
        raise NotImplementedError

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: list[list] = [[] for _ in self.FEATURES]
        for v in batch[self.payload_col].to_pylist():
            try:
                feats = self._features(v or b"")
            except Exception:
                if self.on_error == "raise":
                    raise
                feats = (None,) * len(self.FEATURES)
            for c, f in zip(cols, feats):
                c.append(f)
        out = batch
        for (name, typ), vals in zip(self.FEATURES.items(), cols):
            out = out.append_column(name, pa.array(vals, typ))
        if self.drop_payload:
            out = out.drop_columns([self.payload_col])
        return out


class ImageDecoder(PayloadFeatureStage):
    """REAL image decode stage (BMP/PNG via the pure-numpy codec): binary
    payload column -> (height, width, channels, mean_intensity), dropping
    the payload early so the object store holds features, not media."""

    FEATURES = {"height": pa.int32(), "width": pa.int32(),
                "channels": pa.int32(), "mean_intensity": pa.float64()}

    def _features(self, payload: bytes) -> tuple:
        from .imagecodec import sniff_and_decode
        img = sniff_and_decode(payload)
        return (img.shape[0], img.shape[1],
                img.shape[2] if img.ndim == 3 else 1,
                float(img.mean()) / 255.0)


class FrameSampler:
    """STUB video frame-sampling: emits ``n_frames`` pseudo-frame rows per
    payload (flat_map shape: one input row -> several output rows)."""

    def __init__(self, n_frames: int = 3, payload_col: str = "payload",
                 id_col: str = "doc_id"):
        self.n_frames = n_frames
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        out_ids, out_frame, out_digest = [], [], []
        for i, p in zip(ids, payloads):
            p = p or b""
            for f in range(self.n_frames):
                out_ids.append(i)
                out_frame.append(f)
                out_digest.append(hashlib.md5(p + bytes([f])).hexdigest())
        return pa.table({
            self.id_col: pa.array(out_ids),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "frame_md5": pa.array(out_digest, pa.string()),
        })
