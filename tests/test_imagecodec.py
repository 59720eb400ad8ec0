"""Pure-numpy BMP/PNG codec + the real ImageDecoder stage (upgrades the
multimodal decode path from stub to real for these formats)."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from oregonwaterdataportal_etl_ray.stages.imagecodec import (
    decode_bmp, decode_png, encode_bmp, encode_png, sniff_and_decode)
from oregonwaterdataportal_etl_ray.stages.multimodal import ImageDecoder


def _img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_bmp_roundtrip_including_odd_width():
    for w in (7, 8):                              # 7 exercises row padding
        img = _img(5, w, 3)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_png_roundtrip_gray_rgb_rgba():
    for c in (1, 3, 4):
        img = _img(6, 5, c, seed=c)
        got = decode_png(encode_png(img))
        assert got.shape == (6, 5, c)
        assert np.array_equal(got, img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types (1=Sub,
    2=Up) so the decoder's unfilter paths are exercised against a known
    original."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int16)
    lines = []
    for y, f in enumerate(filters):
        line = flat[y].copy()
        if f == 1:      # Sub: raw[x] = orig[x] - orig[x-c]
            line[c:] = line[c:] - flat[y, :-c]
        elif f == 2:    # Up: raw[x] = orig[x] - prior[x]
            if y:
                line = line - flat[y - 1]
        lines.append(bytes([f]) + (line % 256).astype(np.uint8).tobytes())
    raw = b"".join(lines)

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + \
            struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_sub_and_up_filters_unfilter_correctly():
    img = _img(4, 6, 3, seed=9)
    payload = _png_with_filters(img, [0, 1, 2, 1])
    assert np.array_equal(decode_png(payload), img)


def _png_with_avg_paeth(img: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG using Average(3)/Paeth(4) filters, computing the filtered
    bytes with the spec's integer formulas as an independent reference."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(int)
    lines = []
    for y, f in enumerate(filters):
        orig = flat[y]
        prior = flat[y - 1] if y else np.zeros(w * c, int)
        raw = []
        for x in range(w * c):
            a = int(orig[x - c]) if x >= c else 0
            b = int(prior[x])
            if f == 3:
                raw.append((orig[x] - ((a + b) >> 1)) % 256)
            elif f == 4:
                cc = int(prior[x - c]) if x >= c else 0
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
                raw.append((orig[x] - pred) % 256)
            else:
                raw.append(orig[x] % 256)
        lines.append(bytes([f]) + bytes(raw))
    body = b"".join(lines)

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + \
            struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b""))


def test_png_average_and_paeth_filters_unfilter_correctly():
    img = _img(5, 4, 3, seed=11)
    payload = _png_with_avg_paeth(img, [0, 3, 4, 3, 4])
    assert np.array_equal(decode_png(payload), img)


def test_tolerant_mode_survives_corrupt_compressed_payloads():
    """on_error='null' must survive ANY garbage: zlib-corrupt IDAT,
    truncated headers, zero-channel WAV — a crawl's failure modes are not
    enumerable, so the policy catches everything."""
    import struct as _s
    import zlib as _z
    # valid magic + IHDR but garbage IDAT (raises zlib.error inside)
    def chunk(tag, body):
        return _s.pack(">I", len(body)) + tag + body + \
            _s.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    bad_png = (b"\x89PNG\r\n\x1a\n" +
               chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)) +
               chunk(b"IDAT", b"not zlib data") + chunk(b"IEND", b""))
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "payload": pa.array([bad_png], pa.binary())})
    out = ImageDecoder(on_error="null")(t)
    assert out["height"].to_pylist() == [None]

    from oregonwaterdataportal_etl_ray.stages.audiocodec import AudioFeatures, encode_wav
    good = encode_wav(np.zeros(10, np.int16))
    zero_ch = bytearray(good)
    _s.pack_into("<H", zero_ch, 22, 0)            # fmt.channels = 0
    ta = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "payload": pa.array([bytes(zero_ch), good], pa.binary())})
    outa = AudioFeatures(on_error="null")(ta)
    assert outa["sample_rate"].to_pylist() == [None, 16_000]


def test_sniff_dispatch_and_unknown_raises():
    img = _img(3, 3, 3)
    assert np.array_equal(sniff_and_decode(encode_bmp(img)), img)
    assert np.array_equal(sniff_and_decode(encode_png(img)), img)
    # JPEG now has a real decoder: truncated jpeg-ish bytes are CORRUPT
    # (ValueError), while a format with no decoder stays NotImplementedError
    with pytest.raises(ValueError):
        sniff_and_decode(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(NotImplementedError):
        sniff_and_decode(b"GIF89a no decoder here")


def test_image_decoder_stage_real_and_tolerant():
    img_a, img_b = _img(8, 4, 3, seed=1), _img(5, 5, 1, seed=2)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([encode_bmp(img_a), encode_png(img_b), b"junk"],
                            pa.binary()),
    })
    out = ImageDecoder(on_error="null")(t)
    assert "payload" not in out.column_names
    assert out["height"].to_pylist() == [8, 5, None]
    assert out["width"].to_pylist() == [4, 5, None]
    assert out["channels"].to_pylist() == [3, 1, None]
    assert abs(out["mean_intensity"][0].as_py() - img_a.mean() / 255.0) < 1e-9
    with pytest.raises(NotImplementedError):
        ImageDecoder(on_error="raise")(t)


def test_image_decoder_in_ray_pipeline(ray_session):
    """Actor-pool drive over synthesized images: small batches, payload
    dropped early, features stream out."""
    import ray

    imgs = [encode_png(_img(4 + i, 6, 3, seed=i)) for i in range(20)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "payload": pa.array(imgs, pa.binary()),
    }))
    out = ds.map_batches(ImageDecoder, fn_constructor_kwargs=dict(),
                         batch_format="pyarrow", batch_size=4,
                         concurrency=2).to_pandas().sort_values("doc_id")
    assert len(out) == 20
    assert out["height"].tolist() == [4 + i for i in range(20)]


# ---------------------------------------------------------------------------
# WAV audio codec + feature stage
# ---------------------------------------------------------------------------

def test_wav_roundtrip_and_features():
    from oregonwaterdataportal_etl_ray.stages.audiocodec import (
        AudioFeatures, decode_wav, encode_wav)
    t_axis = np.arange(16_000, dtype=np.float32) / 16_000
    mono = (np.sin(2 * np.pi * 440 * t_axis) * 30_000).astype(np.int16)
    stereo = np.stack([mono, mono // 2], axis=1)
    for samples, c in ((mono, 1), (stereo, 2)):
        x, rate = decode_wav(encode_wav(samples, 16_000))
        assert rate == 16_000 and x.shape == (16_000, c)
        want = (samples.reshape(16_000, c).astype(np.float32) / 32768.0)
        assert np.allclose(x, want, atol=1e-6)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([encode_wav(mono), b"junk"], pa.binary())})
    out = AudioFeatures(on_error="null")(t)
    assert "payload" not in out.column_names
    assert abs(out["duration_s"][0].as_py() - 1.0) < 1e-9
    assert out["sample_rate"].to_pylist() == [16_000, None]
    # rms of a full-scale-ish sine is amplitude/sqrt(2)
    assert abs(out["rms"][0].as_py() - (30_000 / 32768.0) / np.sqrt(2)) < 1e-3
    import pytest
    with pytest.raises(ValueError):
        AudioFeatures(on_error="raise")(t)


def test_audio_features_in_ray_pipeline(ray_session):
    import ray
    from oregonwaterdataportal_etl_ray.stages.audiocodec import AudioFeatures, encode_wav
    rng = np.random.default_rng(5)
    payloads = [encode_wav((rng.standard_normal(800 * (i + 1)) * 1000)
                           .astype(np.int16), 8000) for i in range(10)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "payload": pa.array(payloads, pa.binary())}))
    out = ds.map_batches(AudioFeatures, fn_constructor_kwargs=dict(),
                         batch_format="pyarrow", batch_size=3,
                         concurrency=2).to_pandas().sort_values("doc_id")
    assert np.allclose(out["duration_s"], [(i + 1) * 0.1 for i in range(10)])


def test_adpcm_roundtrip_snr_and_conformance():
    """IMA ADPCM: round-trip SNR on a real waveform, bit-exact agreement of
    the vectorized block decoder with stdlib audioop's C decoder, fact-chunk
    length trim, and the loud stereo/short-block failure modes."""
    import struct

    import pytest
    from oregonwaterdataportal_etl_ray.stages.audiocodec import (
        _adpcm_decode_blocks, decode_wav, encode_adpcm_wav)

    rng = np.random.default_rng(3)
    n = 5000
    t_axis = np.arange(n)
    x = (6000 * np.sin(2 * np.pi * 440 * t_axis / 16000)
         + 2000 * np.sin(2 * np.pi * 97 * t_axis / 16000)
         + rng.normal(0, 120, n)).astype(np.int16)
    wav = encode_adpcm_wav(x, 16_000, block_align=256)
    y, rate = decode_wav(wav)
    assert rate == 16_000 and y.shape == (n, 1)  # fact chunk trims padding
    y16 = (y[:, 0] * 32768).astype(np.int64)
    err = x.astype(np.int64) - y16
    snr = 10 * np.log10(np.mean(x.astype(np.float64) ** 2)
                        / np.mean(err.astype(np.float64) ** 2))
    assert snr > 25.0, snr

    # conformance: first data block vs audioop.adpcm2lin (nibble order swapped)
    audioop = pytest.importorskip("audioop")
    pos = 12
    while True:
        tag = wav[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", wav, pos + 4)
        if tag == b"data":
            data = wav[pos + 8:pos + 8 + ln]
            break
        pos += 8 + ln + (ln & 1)
    b0 = data[:256]
    mine = _adpcm_decode_blocks(b0, 256)
    pred0 = struct.unpack_from("<h", b0, 0)[0]
    nb = np.frombuffer(b0[4:], np.uint8)
    ref_frag, _ = audioop.adpcm2lin(
        (((nb & 0x0F) << 4) | (nb >> 4)).tobytes(), 2, (pred0, b0[2]))
    ref = np.concatenate([[pred0], np.frombuffer(ref_frag, "<i2")])
    assert np.array_equal(mine, ref)

    # stereo ADPCM is a declared gap, not silent garbage
    stereo = wav[:22] + struct.pack("<H", 2) + wav[24:]
    with pytest.raises(NotImplementedError):
        decode_wav(stereo)


# ---------------------------------------------------------------------------
# MJPEG-AVI video codec + frame sampler
# ---------------------------------------------------------------------------

def test_mjpeg_avi_roundtrip_and_sampler(ray_session):
    import ray
    from oregonwaterdataportal_etl_ray.stages.videocodec import (
        MjpegFrameSampler, decode_frame, encode_mjpeg_avi, parse_mjpeg_avi)
    fills = (10, 60, 110, 160, 210)
    avi = encode_mjpeg_avi([np.full((24, 32), v, np.uint8) for v in fills],
                           fps=10)
    meta = parse_mjpeg_avi(avi)
    assert (meta["n_frames"], meta["fps"], meta["width"], meta["height"]) \
        == (5, 10, 32, 24)
    # flat fills survive baseline JPEG exactly; sampling decodes only k JPEGs
    for i, v in enumerate(fills):
        img = decode_frame(avi, meta["frames"], i)
        assert img.shape[:2] == (24, 32) and abs(float(img.mean()) - v) < 0.5
    t = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                  "payload": pa.array([avi, b"nope"], pa.binary())})
    out = MjpegFrameSampler(stride=2, on_error="null")(t).to_pandas()
    good = out[out["doc_id"] == 7]
    assert list(good["frame_idx"]) == [0, 2, 4]
    assert np.allclose(good["mean_intensity"], [10 / 255, 110 / 255, 210 / 255],
                       atol=2 / 255)
    assert out[out["doc_id"] == 8]["frame_idx"].isna().all()
    import pytest
    with pytest.raises(ValueError):
        MjpegFrameSampler(on_error="raise")(t)
    # distributed drive: actor-pool stage over a from_arrow dataset
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "payload": pa.array([avi] * 6, pa.binary())}))
    dist = ds.map_batches(MjpegFrameSampler,
                          fn_constructor_kwargs=dict(stride=2),
                          batch_format="pyarrow", batch_size=2,
                          concurrency=2).to_pandas()
    assert len(dist) == 6 * 3 and set(dist["frame_idx"]) == {0, 2, 4}


def test_mjpeg_sampler_tolerates_corrupt_jpeg_frames():
    """Tolerant mode must survive ANY frame-decode failure, not just
    container errors: a valid AVI whose embedded JPEG is progressive
    (NotImplementedError) or has stripped Huffman tables (KeyError)
    previously escaped the except clause and poisoned the whole batch."""
    from oregonwaterdataportal_etl_ray.stages.videocodec import (
        MjpegFrameSampler, encode_mjpeg_avi)
    good = encode_mjpeg_avi([np.full((16, 16), 99, np.uint8)], fps=5)
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)   # SOF0 -> SOF2
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([good, progressive], pa.binary())})
    out = MjpegFrameSampler(stride=1, on_error="null")(t).to_pandas()
    ok = out[out["doc_id"] == 1]
    assert list(ok["frame_idx"]) == [0] and not ok["mean_intensity"].isna().any()
    bad = out[out["doc_id"] == 2]
    assert len(bad) == 1 and bad["frame_idx"].isna().all()
    import pytest
    with pytest.raises(Exception):
        MjpegFrameSampler(stride=1, on_error="raise")(t)
