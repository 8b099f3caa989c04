"""Native C++ data path: builds with the in-image toolchain and matches the
numpy fallback bit-for-bit."""

import numpy as np

from music_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of native/datapath.cc failed"


def _numpy_mulaw(audio, q=256):
    mu = np.float32(q - 1)
    audio = audio.astype(np.float32)
    safe_abs = np.abs(np.clip(audio, -1.0, 1.0))
    magnitude = np.log1p(mu * safe_abs) / np.log1p(mu)
    signal = np.sign(audio) * magnitude
    return ((signal + 1) / 2 * mu + 0.5).astype(np.int32)


def test_mulaw_encode_matches_numpy():
    rng = np.random.default_rng(0)
    audio = rng.uniform(-1.3, 1.3, 100_000).astype(np.float32)
    ours = native.mulaw_encode(audio)
    ref = _numpy_mulaw(audio)
    # float32 transcendentals in libm vs numpy can differ in the last ulp at
    # quantization boundaries; codes must agree everywhere but a handful
    mismatch = np.mean(ours != ref)
    assert mismatch < 1e-3, mismatch
    assert ours.min() >= 0 and ours.max() <= 255


def test_gather_windows_exact():
    data = np.arange(1000, dtype=np.int32)
    starts = np.asarray([0, 10, 500], np.int64)
    out = native.gather_windows(data, starts, 7)
    np.testing.assert_array_equal(out[1], np.arange(10, 17))
    np.testing.assert_array_equal(out[2], np.arange(500, 507))


def test_pcm_roundtrip():
    rng = np.random.default_rng(1)
    audio = rng.uniform(-1, 1, 10_000).astype(np.float32)
    pcm = native.float_to_pcm16(audio)
    back = native.pcm16_to_float(pcm)
    # quantization 1/32767 + scale skew 32767/32768
    assert np.max(np.abs(back - audio)) < 1.5 / 16000
