"""Pure-Python media codecs: byte-exact round-trips, a hand-built
known-value decode (independent wire construction), and the real
decode -> featurize / resize paths through the Spark kernels."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vector_spark.datapipe.media_codecs import (
    audio_features,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    image_features,
    resize_nearest,
    sniff_and_featurize,
)


def _img(h, w, seed=7):
    rng = np.arange(h * w * 3, dtype=np.int64) * seed % 251
    return rng.astype(np.uint8).reshape(h, w, 3)


def test_bmp_roundtrip_incl_padding():
    # widths 1..5 exercise every 4-byte row-padding case
    for w in (1, 2, 3, 4, 5, 17):
        img = _img(3, w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), w


def test_bmp_known_value_hand_built():
    """Independent construction: a 2x1 top-down BMP built from raw
    struct packing (not encode_bmp) must decode to the exact pixels."""
    w, h = 2, 1
    stride = (w * 3 + 3) & ~3  # 8
    row = bytes([10, 20, 30, 40, 50, 60]) + b"\x00\x00"  # BGR BGR pad
    header = struct.pack("<2sIHHI", b"BM", 54 + len(row), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(row),
                       0, 0, 0, 0)
    img = decode_bmp(header + info + row)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [30, 20, 10]  # RGB of first BGR triple
    assert img[0, 1].tolist() == [60, 50, 40]


def test_bmp_rejects_compressed_and_truncated():
    img = _img(2, 2)
    good = encode_bmp(img)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-4])
    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="uncompressed"):
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_ppm_pgm_roundtrip_and_comments():
    img = _img(4, 5)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    gray = img[:, :, 0]
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)
    # header comments are legal PNM
    with_comment = b"P6\n# made by hand\n2 1\n255\n" + bytes(range(6))
    got = decode_ppm(with_comment)
    assert got.shape == (1, 2, 3) and got.ravel().tolist() == list(range(6))


def test_wav_roundtrip_stereo_and_extra_chunks():
    t = np.arange(1001, dtype=np.float32)
    samples = np.stack(
        [
            (np.sin(t / 8) * 12000).astype(np.int16),
            (np.cos(t / 5) * 9000).astype(np.int16),
        ],
        axis=1,
    )
    rate, got = decode_wav(encode_wav(16000, samples))
    assert rate == 16000 and np.array_equal(got, samples)
    # tolerate a LIST chunk before fmt/data (chunk-walk, not offsets)
    raw = encode_wav(8000, samples[:10])
    body = raw[12:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    rebuilt = (
        b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE"
        + extra + body
    )
    rate2, got2 = decode_wav(rebuilt)
    assert rate2 == 8000 and np.array_equal(got2, samples[:10])


def test_resize_nearest_known_values():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], img)  # every source pixel kept
    down = resize_nearest(img, 2, 2)
    assert np.array_equal(down, img[[0, 2]][:, [0, 2]])


def test_sniff_dispatch():
    img = _img(3, 3)
    assert sniff_and_featurize(encode_bmp(img), 4) == image_features(img, 4)
    assert sniff_and_featurize(encode_ppm(img), 4) == image_features(img, 4)
    wav = encode_wav(8000, (np.ones(64) * 1000).astype(np.int16))
    _, s = decode_wav(wav)
    assert sniff_and_featurize(wav, 4) == audio_features(s, 4)
    assert sniff_and_featurize(b"\x89PNG\r\n\x1a\n...", 4) is None


def test_spark_real_decode_end_to_end(spark):
    """The round-1..3 gap closed: extract_features(fake=False) produces
    REAL feature vectors for BMP/PPM/WAV payloads through the Arrow
    kernel, matching the driver-side numpy reference; undecodable
    payloads flag ok=false."""
    from vector_spark.datapipe.multimodal import (
        extract_features, resize_plan,
    )

    payloads = {
        0: ("image", encode_bmp(_img(6, 9, seed=3)), 96, 64),
        1: ("image", encode_ppm(_img(5, 7, seed=11)), 70, 50),
        2: ("audio", encode_wav(
            16000, (np.arange(640) % 199 * 100).astype(np.int16)
        ), None, None),
        3: ("image", b"\xff\xd8\xff\xe0 pretend jpeg", 10, 10),
    }
    rows = [
        (mid, kind, bytearray(b), "x/" + kind, w, h, 1000)
        for mid, (kind, b, w, h) in payloads.items()
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    feats = {
        r["media_id"]: r
        for r in extract_features(media, dim=6, fake=False).collect()
    }
    assert feats[3]["ok"] is False and feats[3]["feat"] is None
    for mid in (0, 1):
        want = image_features(
            decode_bmp(payloads[0][1]) if mid == 0
            else decode_ppm(payloads[1][1]),
            6,
        )
        assert feats[mid]["ok"] is True
        assert feats[mid]["feat"] == pytest.approx(want)
    _, s = decode_wav(payloads[2][1])
    assert feats[2]["feat"] == pytest.approx(audio_features(s, 6))

    # real resize through the plan: decode -> nearest resize -> encode
    resized = {
        r["media_id"]: r
        for r in resize_plan(
            media.filter("kind = 'image'"), 4, 4, fake=False
        ).collect()
    }
    assert resized[3]["ok"] is False and resized[3]["payload"] is None
    out = decode_bmp(bytes(resized[0]["payload"]))
    assert out.shape[0] <= 4 and out.shape[1] <= 4
    want = resize_nearest(
        decode_bmp(payloads[0][1]), resized[0]["out_w"], resized[0]["out_h"]
    )
    assert np.array_equal(out, want)
