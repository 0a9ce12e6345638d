"""Multimodal decode kernels: real BMP/WAV roundtrips + the Spark-side
feature pipeline with deterministic=False (r2 verdict item 10)."""

import numpy as np
import pytest

from perlin_spark.extras import multimodal as mm


def test_bmp_roundtrip():
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (5, 3), (33, 47)]:  # odd widths exercise row padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)


def test_wav_roundtrip_mono_and_stereo():
    t = np.arange(8000)
    mono = (np.sin(t * 0.05) * 20000).astype(np.int16)
    dec, rate = mm.decode_wav(mm.encode_wav(mono, 16000))
    assert rate == 16000 and np.array_equal(dec[:, 0], mono)
    stereo = np.stack([mono, (mono // 2)], axis=1)
    dec2, rate2 = mm.decode_wav(mm.encode_wav(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(dec2, stereo)


def test_compressed_formats_raise_at_seam():
    with pytest.raises(NotImplementedError):
        mm.real_decode(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(ValueError):
        mm.decode_bmp(b"not a bmp")


def test_extract_features_real_decode(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(6):
        if i % 2 == 0:
            img = rng.integers(0, 256, (8 + i, 9, 3), dtype=np.uint8)
            rows.append((i, "image", "image/bmp", bytearray(mm.encode_bmp(img)),
                         9, 8 + i, None))
        else:
            s = (np.sin(np.arange(2000) * (0.01 * i)) * 15000).astype(np.int16)
            rows.append((i, "audio", "audio/wav", bytearray(mm.encode_wav(s, 8000)),
                         None, None, 250))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.extract_features(media, deterministic=False).collect()}
    assert len(out) == 6
    for i, r in out.items():
        f = np.array(r["feature"])
        assert f.shape == (mm.FEATURE_DIM,) and np.isfinite(f).all()
        assert f[0] == (1.0 if i % 2 == 0 else 2.0)  # modality tag survives
        assert r["n_bytes"] > 0


def test_extract_features_fake_decode_deterministic(spark):
    media = mm.synth_media(spark, n=9)
    a = mm.extract_features(media).collect()
    b = mm.extract_features(media).collect()
    key = lambda rows: sorted((r["media_id"], tuple(r["feature"])) for r in rows)
    assert key(a) == key(b)
