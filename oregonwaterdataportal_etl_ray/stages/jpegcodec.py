"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

Upgrades the JPEG half of the multimodal stage from a declared stub to a
real decoder: no image library ships in this container, but baseline JPEG
is markers + canonical Huffman + 8x8 DCT, all expressible with stdlib +
numpy. Supported: SOF0 (baseline sequential), 8-bit samples, gray or
YCbCr 3-component, arbitrary chroma subsampling with integer ratios,
restart intervals, 8/16-bit quantization tables. NOT supported (raises
``NotImplementedError`` loudly): progressive (SOF2), arithmetic coding,
hierarchical, 12-bit — swap in PIL in deployment for those; nothing else
in the pipeline changes.

The encoder (baseline, 4:4:4, the public Annex K quantization + Huffman
tables) exists so tests can do encode->decode roundtrips on synthetic
images; a stdlib-shipped reference JPEG provides the external conformance
check (tests/test_jpegcodec.py).

Entropy decoding is inherently bit-serial, so per-payload Python loops are
expected here — the DISTRIBUTION is the Ray actor pool around it
(stages/multimodal.py ImageDecoder), which is why media stages run with
small batch sizes. The DCT itself is vectorized (one 8x8 orthonormal basis
matmul per block).

Tables DQT/DHT Annex K of ITU-T T.81 (public standard).
"""

from __future__ import annotations

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# zigzag scan order: index i of the scan -> (row, col) flattened position
_ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# orthonormal DCT-II basis: spatial = M.T @ coeffs @ M ; coeffs = M @ f @ M.T
_M = np.array([[(np.sqrt(0.125) if u == 0 else 0.5)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])

# Annex K.1/K.2 quantization tables (natural order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,   12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,   14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,  18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,  47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99])

# Annex K.3 typical Huffman tables: (bits[1..16] counts, symbol values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict:
    """(length, code) -> symbol, canonical ascending (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _sym_to_code(counts: list[int], symbols: list[int]) -> dict:
    return {s: lc for lc, s in _canonical_codes(counts, symbols).items()}


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise ValueError("truncated JPEG entropy stream")
            self.buf = self.d[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_sym(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        s = table.get((length, code))
        if s is not None:
            return s
    raise ValueError("invalid JPEG huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array (h, w) gray or (h, w, 3) RGB."""
    if payload[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    h = w = 0
    restart = 0
    i = 2
    scan_data = None
    while i < len(payload) - 1:
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = payload[i + 1]
        if m == 0xFF:          # fill byte
            i += 1
            continue
        if m == 0xD9:          # EOI
            break
        if m in (0x01, *range(0xD0, 0xD8)):
            i += 2
            continue
        L = int.from_bytes(payload[i + 2:i + 4], "big")
        seg = payload[i + 4:i + 2 + L]
        if m == 0xDB:          # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 15
                n = 64 * (2 if prec else 1)
                raw = seg[j + 1:j + 1 + n]
                vals = (np.frombuffer(raw, ">u2") if prec
                        else np.frombuffer(raw, np.uint8)).astype(np.int32)
                nat = np.empty(64, np.int32)
                nat[_ZZ] = vals   # zigzag order in the file -> natural
                qt[tid] = nat.reshape(8, 8)
                j += 1 + n
        elif m == 0xC4:        # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1:j + 17])
                n = sum(counts)
                syms = list(seg[j + 17:j + 17 + n])
                huff[(cls, tid)] = _canonical_codes(counts, syms)
                j += 17 + n
        elif m == 0xC0 or m == 0xC1:   # SOF0/1 baseline
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = [{"id": seg[6 + 3 * c], "H": seg[7 + 3 * c] >> 4,
                      "V": seg[7 + 3 * c] & 15, "tq": seg[8 + 3 * c]}
                     for c in range(nc)]
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker FF{m:02X} (progressive/arithmetic/"
                "hierarchical) not supported by the pure-numpy decoder — "
                "plug PIL into ImageDecoder in deployment")
        elif m == 0xDD:        # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:        # SOS — entropy data follows
            ns = seg[0]
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["dc"] = tabs >> 4
                comp["ac"] = tabs & 15
            scan_data = payload[i + 2 + L:]
            break
        i += 2 + L
    if scan_data is None or not comps:
        raise ValueError("JPEG missing SOS/SOF")

    # de-stuff entropy bytes; split at restart markers
    segments: list[bytes] = []
    cur = bytearray()
    j = 0
    while j < len(scan_data):
        b = scan_data[j]
        if b != 0xFF:
            cur.append(b)
            j += 1
            continue
        nxt = scan_data[j + 1] if j + 1 < len(scan_data) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            j += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            j += 2
        else:                  # EOI or next marker
            break
    segments.append(bytes(cur))

    hmax = max(c["H"] for c in comps)
    vmax = max(c["V"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * 8 * c["V"], mcux * 8 * c["H"]), np.float64)
              for c in comps]
    pred = [0] * len(comps)
    seg_idx = 0
    br = _BitReader(segments[0])
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            seg_idx += 1
            br = _BitReader(segments[seg_idx])
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, comp in enumerate(comps):
            q = qt[comp["tq"]]
            dc_t = huff[(0, comp["dc"])]
            ac_t = huff[(1, comp["ac"])]
            for by in range(comp["V"]):
                for bx in range(comp["H"]):
                    coef = np.zeros(64, np.float64)
                    t = _decode_sym(br, dc_t)
                    pred[ci] += _extend(br.bits(t), t)
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_sym(br, ac_t)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:     # ZRL
                                k += 16
                                continue
                            break           # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[_ZZ[k]] = _extend(br.bits(s), s)
                        k += 1
                    block = _M.T @ (coef.reshape(8, 8) * q) @ _M + 128.0
                    y0 = (my * comp["V"] + by) * 8
                    x0 = (mx * comp["H"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = block
    # upsample to full resolution and crop
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["V"], axis=0),
                      hmax // comp["H"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)
    if len(full) != 3:
        # CMYK/YCCK (4-component Adobe) or 2-component: applying YCbCr math
        # to the first 3 planes would be confidently WRONG output — fail
        # loud like the progressive-JPEG path
        raise NotImplementedError(
            f"only 1- or 3-component JPEGs supported, got {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4, Annex K tables) — for tests / synthetic payloads
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)   # pad with 1-bits (T.81 F.1.2.3)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.int32)


def _mag(v: int) -> tuple[int, int]:
    """value -> (category bits, coded magnitude)."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline JPEG bytes (4:4:4)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., k].astype(np.float64) for k in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    qts = [_quality_scale(_QT_LUMA, quality).reshape(8, 8),
           _quality_scale(_QT_CHROMA, quality).reshape(8, 8)]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    for tid, q in enumerate(qts[:1 if gray else 2]):
        zz = q.reshape(64)[_ZZ]  # natural -> zigzag file order
        out += seg(0xDB, bytes([tid]) + bytes(int(x) for x in zz))
    nc = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += seg(0xC0, sof)
    tables = [(_DC_LUMA, 0x00), (_AC_LUMA, 0x10)]
    if not gray:
        tables += [(_DC_CHROMA, 0x01), (_AC_CHROMA, 0x11)]
    for (counts, syms), cls_id in tables:
        out += seg(0xC4, bytes([cls_id]) + bytes(counts) + bytes(syms))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    dc_codes = [_sym_to_code(*_DC_LUMA), _sym_to_code(*_DC_CHROMA)]
    ac_codes = [_sym_to_code(*_AC_LUMA), _sym_to_code(*_AC_CHROMA)]
    bw = _BitWriter()
    pred = [0] * nc
    inv_zz = _ZZ  # coef natural index for scan position k is _ZZ[k]
    for my in range(ph // 8):
        for mx in range(pw // 8):
            for ci in range(nc):
                tix = 0 if ci == 0 else 1
                p = planes[ci]
                blk = np.full((8, 8), float(p[-1, -1]))
                ys, xs = min(8, h - my * 8), min(8, w - mx * 8)
                if ys <= 0 or xs <= 0:
                    ys = xs = 0
                src = p[my * 8:my * 8 + ys, mx * 8:mx * 8 + xs]
                blk[:ys, :xs] = src
                if ys and ys < 8:
                    blk[ys:, :xs] = src[-1:, :]
                if xs and xs < 8:
                    blk[:, xs:] = blk[:, xs - 1:xs]
                coef = _M @ (blk - 128.0) @ _M.T
                qc = np.round(coef / qts[tix]).astype(np.int64).reshape(64)
                scan = qc[inv_zz]
                d = int(scan[0]) - pred[ci]
                pred[ci] = int(scan[0])
                t, bitsv = _mag(d)
                length, code = dc_codes[tix][t]
                bw.write(code, length)
                if t:
                    bw.write(bitsv, t)
                run = 0
                nz = np.flatnonzero(scan[1:])
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(scan[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        length, code = ac_codes[tix][0xF0]
                        bw.write(code, length)
                        run -= 16
                    t, bitsv = _mag(v)
                    length, code = ac_codes[tix][(run << 4) | t]
                    bw.write(code, length)
                    bw.write(bitsv, t)
                    run = 0
                if last < 63:
                    length, code = ac_codes[tix][0x00]
                    bw.write(code, length)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
