"""Audio fingerprint + near-dup pairs vs a brute-force reference."""

import itertools

import numpy as np
import pytest

from perlin_spark.extras import multimodal as mm


def _clip(seed: int, n: int = 8000, rate: int = 8000) -> np.ndarray:
    """Deterministic tonal clip: a few seeded partials + noise floor."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = np.zeros(n)
    for _ in range(4):
        f = rng.uniform(80, 0.4 * rate)
        x += rng.uniform(0.3, 1.0) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    x += rng.normal(0, 0.05, n)
    x = x / np.abs(x).max() * 0.7
    return (x * 32767).astype(np.int16).reshape(-1, 1)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_fingerprint_gain_invariance_and_noise_tolerance():
    clip = _clip(5)
    h0 = mm.audio_fingerprint(clip, 8000)
    assert 0 <= h0 < (1 << mm.AHASH_BITS)
    # gain change (log + double diff cancels constants): identical hash
    half = (clip.astype(np.float64) * 0.5).astype(np.int16)
    assert mm.audio_fingerprint(half, 8000) == h0
    # WAV re-encode (lossless) is identical
    rt, rate = mm.decode_wav(mm.encode_wav(clip, 8000))
    assert (rate, mm.audio_fingerprint(rt, rate)) == (8000, h0)
    # small additive noise stays within a tight radius
    rng = np.random.default_rng(0)
    noisy = np.clip(
        clip.astype(np.int32) + rng.integers(-300, 301, clip.shape), -32768, 32767
    ).astype(np.int16)
    assert _ham(mm.audio_fingerprint(noisy, 8000), h0) <= 10
    # a different clip is far
    assert _ham(mm.audio_fingerprint(_clip(77), 8000), h0) > 12


def test_fingerprint_degenerate_clips():
    silent = np.zeros((512, 1), np.int16)
    assert 0 <= mm.audio_fingerprint(silent, 8000) < (1 << mm.AHASH_BITS)
    tiny = np.ones((5, 1), np.int16)  # shorter than the frame grid
    assert mm.audio_fingerprint(tiny, 8000) == 5
    stereo = np.hstack([_clip(1), _clip(1)])
    assert mm.audio_fingerprint(stereo, 8000) == mm.audio_fingerprint(_clip(1), 8000)


@pytest.fixture(scope="module")
def media(spark):
    rows, mid = [], 0
    for seed in range(6):
        clip = _clip(seed)
        rows.append((mid, "audio", "audio/wav",
                     bytearray(mm.encode_wav(clip, 8000)), None, None, 1000))
        mid += 1
        if seed < 2:  # two near-duplicate partners (noisy re-takes)
            rng = np.random.default_rng(500 + seed)
            dup = np.clip(clip.astype(np.int32)
                          + rng.integers(-250, 251, clip.shape),
                          -32768, 32767).astype(np.int16)
            rows.append((mid, "audio", "audio/wav",
                         bytearray(mm.encode_wav(dup, 8000)), None, None, 1000))
            mid += 1
    # image rows must be ignored by the audio hasher
    rgb = np.full((8, 8, 3), 128, np.uint8)
    rows.append((mid, "image", "image/bmp", bytearray(mm.encode_bmp(rgb)),
                 8, 8, None))
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_audio_hash_real_decode_matches_local(media):
    got = {r["media_id"]: r["ahash"]
           for r in mm.audio_hash(media, deterministic=False).collect()}
    rows = media.filter("kind = 'audio'").collect()
    assert set(got) == {r["media_id"] for r in rows}
    for r in rows:
        samples, rate = mm.decode_wav(bytes(r["payload"]))
        assert got[r["media_id"]] == mm.audio_fingerprint(samples, rate)


def test_ahash_near_pairs_equals_brute_force(media):
    d = 10
    hashes = {r["media_id"]: r["ahash"]
              for r in mm.audio_hash(media, deterministic=False).collect()}
    want = {
        (a, b, _ham(hashes[a], hashes[b]))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if _ham(hashes[a], hashes[b]) <= d
    }
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in mm.ahash_near_pairs(media, max_hamming=d,
                                     deterministic=False).collect()
    }
    assert got == want
    assert {(a, b) for a, b, _ in want} >= {(0, 1), (2, 3)}
