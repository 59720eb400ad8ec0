"""Pure numpy+zlib image codec: BMP (BI_RGB 24-bit) and PNG (8-bit).

Implements the media decode path the container's lack of PIL/ffmpeg would
otherwise stub: both formats are public, simple specifications (BMP:
Windows BITMAPINFOHEADER; PNG: RFC 2083 — zlib-compressed scanlines with
five per-scanline byte filters). Decode is vectorized: BMP is one
``frombuffer`` reshape; PNG unfilters None/Sub/Up with whole-array numpy
ops (Sub is a modulo-256 cumsum) and falls back to a per-scanline loop
only for Average/Paeth rows. Encode (filter None) exists so tests and
fixtures can synthesize deterministic images without any library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"


# ---------------------------------------------------------------------------
# BMP — BI_RGB 24-bit bottom-up
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_size = (w * 3 + 3) // 4 * 4
    bgr = img[::-1, :, ::-1]                     # bottom-up, BGR
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows.tobytes()
    header = struct.pack("<2sIHHI", BMP_MAGIC, 14 + 40 + len(pixel_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data),
                       2835, 2835, 0, 0)
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * row_size,
                         offset=data_offset).reshape(h, row_size)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]   # BGR -> RGB
    return img[::-1] if bottom_up else img


# ---------------------------------------------------------------------------
# PNG — 8-bit grayscale / RGB / RGBA, non-interlaced
# ---------------------------------------------------------------------------

_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(img: np.ndarray) -> bytes:
    """(H, W) or (H, W, {1,3,4}) uint8 -> PNG bytes (filter None)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    raw = np.concatenate([np.zeros((h, 1), np.uint8),   # filter byte 0
                          img.reshape(h, w * c)], axis=1).tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + tag + body + \
            struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return PNG_MAGIC + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8. 8-bit depth, non-interlaced only."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos < len(payload):
        (length,), tag = struct.unpack_from(">I", payload, pos), \
            payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _, _, interlace = meta
    if depth != 8 or interlace != 0 or color not in _COLOR_CHANNELS:
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB(A) PNG (depth={depth}, "
            f"color={color}, interlace={interlace})")
    c = _COLOR_CHANNELS[color]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):                            # per scanline, not per pixel
        line = raw[y, 1:].copy()
        prior = out[y - 1] if y else np.zeros(stride, np.uint8)
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 2:                              # Up — whole-line vector add
            out[y] = line + prior
        elif f == 1:                              # Sub — mod-256 prefix sum
            px = line.reshape(-1, c)
            out[y] = np.cumsum(px.astype(np.uint64), axis=0).astype(np.uint8) \
                .reshape(-1)
        elif f in (3, 4):                         # Average/Paeth: x-sequential
            # plain-int arithmetic in the loop — allocating 0-d arrays per
            # byte is 10-100x slower, and real encoders use Paeth heavily
            rec = [0] * stride
            pr = prior.tolist()
            ln = line.tolist()
            for x in range(stride):
                a = rec[x - c] if x >= c else 0
                b = int(pr[x])
                if f == 3:
                    rec[x] = (ln[x] + ((a + b) >> 1)) & 0xFF
                else:
                    cc = int(pr[x - c]) if x >= c else 0
                    p = a + b - cc
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                        (b if pb_ <= pc_ else cc)
                    rec[x] = (ln[x] + pred) & 0xFF
            out[y] = np.asarray(rec, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, c)


def sniff_and_decode(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch. Raises NotImplementedError for formats with no
    pure-python decoder here (video, progressive JPEG, ...)."""
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == BMP_MAGIC:
        return decode_bmp(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from .jpegcodec import decode_jpeg
        return decode_jpeg(payload)
    raise NotImplementedError("no pure-python decoder for this format "
                              "(plug PIL/ffmpeg into ImageDecoder in deployment)")
