"""Perceptual image hash + near-dup pairs vs a brute-force reference.

Fixtures are 1/f-spectrum ("natural image") noise: pHash's median
threshold assumes the spread low-frequency spectrum natural images have;
pure sinusoid test patterns park most coefficients at the median and
measure coin flips instead of the hash.
"""

import itertools

import numpy as np
import pytest

from perlin_spark.extras import multimodal as mm


def _img(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Deterministic natural-spectrum image (1/f^1.5 filtered noise)."""
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    amp = 1.0 / (0.02 + np.sqrt(fy * fy + fx * fx)) ** 1.5

    def field(scale):
        spec = amp * (rng.normal(size=(h, w // 2 + 1))
                      + 1j * rng.normal(size=(h, w // 2 + 1)))
        d = np.fft.irfft2(spec, s=(h, w))
        return (d - d.min()) / (d.ptp() + 1e-9) * scale

    base = field(255.0)
    chans = [base] + [np.clip(base * 0.8 + field(60.0), 0, 255) for _ in range(2)]
    return np.clip(np.stack(chans, 2), 0, 255).astype(np.uint8)


def _perturb(rgb: np.ndarray, seed: int) -> np.ndarray:
    """Small iid pixel noise -- a near-duplicate."""
    rng = np.random.default_rng(seed)
    out = rgb.astype(np.int16) + rng.integers(-8, 9, size=rgb.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_bits_and_determinism():
    h1 = mm.phash(_img(1))
    assert 0 <= h1 < (1 << mm.PHASH_BITS)
    assert mm.phash(_img(1)) == h1
    # roughly half the bits set (median threshold)
    assert 20 <= bin(h1).count("1") <= 40


def test_phash_encoding_invariance_and_noise_tolerance():
    rgb = _img(7)
    h0 = mm.phash(rgb)
    # lossless re-encodes hash identically
    assert mm.phash(mm.decode_bmp(mm.encode_bmp(rgb))) == h0
    assert mm.phash(mm.decode_png(mm.encode_png(rgb, filters="paeth"))) == h0
    # lossy JPEG re-encode stays within a tight radius
    assert _ham(mm.phash(mm.decode_jpeg(mm.encode_jpeg(rgb))), h0) <= 6
    # small pixel noise stays within a tight radius
    assert _ham(mm.phash(_perturb(rgb, 2)), h0) <= 6
    # resize (same content, different raster) stays close
    assert _ham(mm.phash(rgb[::2, ::2]), h0) <= 10
    # a structurally different image is far
    assert _ham(mm.phash(_img(29)), h0) > 14


def test_phash_small_image_path():
    tiny = _img(3, h=10, w=14)  # below the 32x32 grid -> upsample branch
    assert 0 <= mm.phash(tiny) < (1 << mm.PHASH_BITS)
    assert mm.phash(tiny) == mm.phash(tiny)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    mid = 0
    for seed in range(8):
        rgb = _img(seed)
        rows.append((mid, "image", "image/bmp", bytearray(mm.encode_bmp(rgb)),
                     rgb.shape[1], rgb.shape[0], None))
        mid += 1
        if seed < 3:  # three near-duplicate partners
            dup = _perturb(rgb, 100 + seed)
            rows.append((mid, "image", "image/png",
                         bytearray(mm.encode_png(dup)), dup.shape[1],
                         dup.shape[0], None))
            mid += 1
    # non-image rows must be ignored by the hasher
    rows.append((mid, "audio", "audio/wav",
                 bytearray(mm.encode_wav(np.zeros((64, 1), np.int16), 8000)),
                 None, None, 8))
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_image_phash_real_decode_matches_local(media):
    got = {r["media_id"]: r["phash"]
           for r in mm.image_phash(media, deterministic=False).collect()}
    rows = media.filter("kind = 'image'").collect()
    assert set(got) == {r["media_id"] for r in rows}
    for r in rows:
        buf = bytes(r["payload"])
        rgb = mm.decode_bmp(buf) if r["mime"] == "image/bmp" else mm.decode_png(buf)
        assert got[r["media_id"]] == mm.phash(rgb)


def test_phash_near_pairs_equals_brute_force(media):
    d = 8
    hashes = {r["media_id"]: r["phash"]
              for r in mm.image_phash(media, deterministic=False).collect()}
    want = {
        (a, b, _ham(hashes[a], hashes[b]))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if _ham(hashes[a], hashes[b]) <= d
    }
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in mm.phash_near_pairs(media, max_hamming=d,
                                     deterministic=False).collect()
    }
    assert got == want
    # the three perturbed partners are found
    assert {(a, b) for a, b, _ in want} >= {(0, 1), (2, 3), (4, 5)}


def test_phash_near_pairs_deterministic_mode_no_false_pairs(media):
    # fake-pixel mode: iid pixels per payload -> no near pairs at d=3
    out = mm.phash_near_pairs(media, max_hamming=3, deterministic=True)
    assert out.count() == 0
