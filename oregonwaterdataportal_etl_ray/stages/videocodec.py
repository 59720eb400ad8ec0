"""Pure-python MJPEG-in-AVI video codec + frame-sampling stage.

This closes the video leg of the multimodal battery with a REAL decode
path: AVI is a plain RIFF container (public spec: Microsoft AVI RIFF
format), and an MJPEG stream is one baseline JPEG per frame — which
:mod:`.jpegcodec` already decodes pure-numpy. So a real video pipeline
(container parse → frame-sample → per-frame decode → features) needs no
external library here. Perceptual inter-frame codecs (H.264/VP9/AV1) are
NOT decodable without ffmpeg; ``FrameSampler`` in :mod:`.multimodal` stays
the declared stub for those, and this module is the drop-in shape a
deployment swaps ffmpeg into.

Scale notes (mirrors the image/audio stages): payloads are opaque binary
columns; the sampler is an actor-pool ``map_batches`` stage with small
batches; frame decode happens INSIDE the stage and only (id, frame_idx,
features) rows leave it — sampled-frame selection reads just the RIFF
index, so skipping frames never inflates the object store.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .jpegcodec import decode_jpeg, encode_jpeg


def encode_mjpeg_avi(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """List of uint8 gray/RGB frames (same shape) -> MJPEG AVI bytes."""
    assert frames, "need at least one frame"
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f) for f in frames]

    movi_items = []
    offsets = []          # chunk offset relative to 'movi' fourcc, for idx1
    pos = 4               # past the 'movi' fourcc
    for j in jpegs:
        offsets.append(pos)
        body = j + (b"\x00" if len(j) & 1 else b"")
        movi_items.append(b"00dc" + struct.pack("<I", len(j)) + body)
        pos += 8 + len(body)
    movi = b"LIST" + struct.pack("<I", 4 + sum(len(m) for m in movi_items)) \
        + b"movi" + b"".join(movi_items)

    avih = b"avih" + struct.pack(
        "<IIIIIIIIIIIIIII", 56, 1_000_000 // fps, 0, 0, 0x10, len(jpegs), 0,
        1, max(len(j) for j in jpegs), w, h, 0, 0, 0, 0)
    strh = b"strh" + struct.pack(
        "<I4s4sIHHIIIIIIIi4h", 56, b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0,
        len(jpegs), 0, 10_000, -1, 0, 0, w, h)
    strf = b"strf" + struct.pack(
        "<IIiiHH4sIiiII", 40, 40, w, h, 1, 24, b"MJPG", w * h * 3,
        0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) \
        + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) \
        + b"hdrl" + avih + strl

    idx = b"".join(b"00dc" + struct.pack("<III", 0x10, off, len(j))
                   for off, j in zip(offsets, jpegs))
    idx1 = b"idx1" + struct.pack("<I", len(idx)) + idx

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_mjpeg_avi(payload: bytes) -> dict:
    """AVI bytes -> {n_frames, fps, width, height, frames: [(off, size)]}.

    Only the header and chunk boundaries are touched — frame bytes are
    located, not copied, so sampling k of N frames decodes exactly k JPEGs.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    n_frames = fps = width = height = None
    frames: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
        nonlocal n_frames, fps, width, height
        pos = start
        while pos + 8 <= end:
            tag = payload[pos:pos + 4]
            (length,) = struct.unpack_from("<I", payload, pos + 4)
            body_at = pos + 8
            if tag == b"LIST":
                walk(body_at + 4, body_at + length)
            elif tag == b"avih" and length >= 44:
                v = struct.unpack_from("<IIIIIIIIII", payload, body_at)
                n_frames, width, height = v[4], v[8], v[9]
            elif tag == b"strh" and length >= 48:
                fcc, _h, _f, _p, _l, _i, scale, rate = struct.unpack_from(
                    "<4s4sIHHIII", payload, body_at)
                if fcc == b"vids":
                    if scale < 1 or rate < 1:
                        raise ValueError("corrupt AVI stream header")
                    # nearest int, not floor: NTSC 30000/1001 is 30, not 29
                    fps = (rate + scale // 2) // scale
            elif tag[2:] in (b"dc", b"db"):
                frames.append((body_at, length))
            pos = body_at + length + (length & 1)

    walk(12, len(payload))
    if n_frames is None or fps is None or not frames:
        raise ValueError("AVI missing header or frames")
    return {"n_frames": len(frames), "fps": fps, "width": width,
            "height": height, "frames": frames}


def decode_frame(payload: bytes, frames: list[tuple[int, int]],
                 idx: int) -> np.ndarray:
    off, size = frames[idx]
    return decode_jpeg(payload[off:off + size])


class MjpegFrameSampler:
    """REAL video frame-sampling stage: AVI payload column -> one row per
    sampled frame ``(id, frame_idx, n_frames, fps, height, width,
    mean_intensity)``. Samples every ``stride``-th frame; only those JPEGs
    are decoded. ``on_error='null'`` keeps the corrupt row with null
    features (one row, frame_idx null) instead of poisoning the batch."""

    def __init__(self, stride: int = 2, payload_col: str = "payload",
                 id_col: str = "doc_id", on_error: str = "raise"):
        assert stride >= 1 and on_error in ("raise", "null")
        self.stride = stride
        self.payload_col = payload_col
        self.id_col = id_col
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        out: dict[str, list] = {k: [] for k in
                                ("id", "frame_idx", "n_frames", "fps",
                                 "height", "width", "mean_intensity")}
        for i, p in zip(ids, payloads):
            # buffer one payload's rows so a mid-payload decode failure in
            # tolerant mode yields exactly ONE null row, never a partial
            # frame set plus a null marker
            rows: list[tuple] = []
            try:
                meta = parse_mjpeg_avi(p or b"")
                for f in range(0, meta["n_frames"], self.stride):
                    img = decode_frame(p, meta["frames"], f)
                    rows.append((f, meta["n_frames"], meta["fps"],
                                 img.shape[0], img.shape[1],
                                 float(img.mean()) / 255.0))
            except Exception:
                # ANY decode failure counts as corrupt in tolerant mode
                # (KeyError from missing Huffman tables, NotImplementedError
                # from progressive JPEG, ... — same policy as
                # PayloadFeatureStage); 'raise' mode surfaces it
                if self.on_error == "raise":
                    raise
                rows = []
            if rows:
                for f, nf, fps, h, w, mi in rows:
                    out["id"].append(i)
                    out["frame_idx"].append(f)
                    out["n_frames"].append(nf)
                    out["fps"].append(fps)
                    out["height"].append(h)
                    out["width"].append(w)
                    out["mean_intensity"].append(mi)
            elif self.on_error == "null":
                out["id"].append(i)
                for k in ("frame_idx", "n_frames", "fps", "height", "width",
                          "mean_intensity"):
                    out[k].append(None)
        return pa.table({
            # explicit id type: a zero-row batch would otherwise infer a
            # null-typed id column and break block-schema unification
            self.id_col: pa.array(out["id"], batch[self.id_col].type),
            "frame_idx": pa.array(out["frame_idx"], pa.int32()),
            "n_frames": pa.array(out["n_frames"], pa.int32()),
            "fps": pa.array(out["fps"], pa.int32()),
            "height": pa.array(out["height"], pa.int32()),
            "width": pa.array(out["width"], pa.int32()),
            "mean_intensity": pa.array(out["mean_intensity"], pa.float64()),
        })
