"""Baseline JPEG codec: external-conformance decode of a stdlib-shipped
reference JPEG (foreign encoder, 2x2 chroma subsampling), encode->decode
roundtrips on synthetic images, and the loud NotImplementedError contract
for progressive streams."""

import glob

import numpy as np
import pytest

from oregonwaterdataportal_etl_ray.stages.imagecodec import sniff_and_decode
from oregonwaterdataportal_etl_ray.stages.jpegcodec import decode_jpeg, encode_jpeg


def _stdlib_jpeg() -> bytes | None:
    """A real 16x16 baseline JPEG shipped with CPython's test suite (read
    from the interpreter install; not vendored into this repo)."""
    for pat in ("/root/.pyenv/versions/*/lib/python3.11/test/test_email/data/python.jpg",
                "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.jpg"):
        hits = sorted(glob.glob(pat))
        if hits:
            with open(hits[0], "rb") as f:
                return f.read()
    return None


def test_decode_foreign_encoder_conformance():
    payload = _stdlib_jpeg()
    if payload is None:
        pytest.skip("no stdlib reference JPEG on this interpreter")
    img = decode_jpeg(payload)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # the image is the Python logo: its two brand colors must appear
    # (within JPEG quantization error) — catches DCT/huffman/color bugs
    blue = np.abs(img.astype(int) - np.array([48, 105, 152])).sum(-1).min()
    yellow = np.abs(img.astype(int) - np.array([255, 212, 59])).sum(-1).min()
    assert blue < 40 and yellow < 40
    # same path through the multimodal dispatch
    assert sniff_and_decode(payload).shape == (16, 16, 3)


def test_roundtrip_gray_and_rgb():
    g = np.tile(np.linspace(0, 255, 24, dtype=np.uint8), (17, 1))
    rt = decode_jpeg(encode_jpeg(g, quality=90))
    assert rt.shape == (17, 24)
    assert float(np.square(rt.astype(float) - g).mean()) < 4.0

    y, x = np.mgrid[0:32, 0:40]
    rgb = np.stack([np.clip(x * 6, 0, 255), np.clip(y * 7, 0, 255),
                    np.clip((x + y) * 3, 0, 255)], -1).astype(np.uint8)
    rt = decode_jpeg(encode_jpeg(rgb, quality=92))
    assert rt.shape == (32, 40, 3)
    assert float(np.square(rt.astype(float) - rgb).mean()) < 9.0


def test_flat_block_is_exact_and_odd_sizes_pad():
    f = np.full((16, 16, 3), 127, np.uint8)
    assert np.abs(decode_jpeg(encode_jpeg(f)).astype(int) - 127).max() == 0
    o = (np.arange(11 * 13).reshape(11, 13) * 2 % 256).astype(np.uint8)
    rt = decode_jpeg(encode_jpeg(o, quality=95))
    assert rt.shape == (11, 13)


def test_progressive_raises_not_implemented():
    blob = encode_jpeg(np.zeros((8, 8), np.uint8))
    # flip the SOF0 marker (FFC0) to SOF2 (progressive)
    i = blob.index(b"\xff\xc0")
    mutated = blob[:i] + b"\xff\xc2" + blob[i + 2:]
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(mutated)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nope")
