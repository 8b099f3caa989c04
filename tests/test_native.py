"""Native C++ data path: builds with the in-image toolchain and matches the
numpy fallback bit-for-bit."""

import pytest
import numpy as np

from music_tpu import native

pytestmark = pytest.mark.fast  # seconds-fast regression tier (pytest -m fast)


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


def test_prefetch_batches_order_and_exceptions():
    from music_tpu.data.prefetch import PrefetchBatches

    assert list(PrefetchBatches(range(100), depth=3)) == list(range(100))

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer failed")

    it = PrefetchBatches(boom())
    assert next(it) == 1 and next(it) == 2
    try:
        next(it)
        assert False, "expected RuntimeError"
    except RuntimeError as e:
        assert "producer failed" in str(e)
    it2 = PrefetchBatches(range(1000), depth=2)
    assert next(it2) == 0
    it2.close()  # early exit doesn't hang


def test_native_smf_parser_matches_python(tmp_path):
    """The C++ SMF event extractor must reproduce the Python parser exactly
    (ticks exact, freqs to float precision) on real multi-note files."""
    import numpy as np

    from music_tpu import native
    from music_tpu.data import midi

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    n = 60
    events = np.zeros((n, 4), np.float64)
    events[:, 0] = rng.integers(0, 200, n)            # delta ticks
    events[:, 1] = rng.integers(10, 500, n)           # lengths
    events[:, 2] = [midi.tone_to_freq(int(t)) for t in rng.integers(40, 90, n)]
    events[:, 3] = rng.integers(1, 127, n)            # velocities
    path = tmp_path / "t.mid"
    midi.events_to_midi(events, path, ticks_per_quarter_note=480)

    ref = midi.midi_to_song_data(path, 384, use_native=False)
    nat = midi.midi_to_song_data(path, 384, use_native=True)
    got = native.parse_smf_events(path.read_bytes(), 384)
    assert got is not None, "native parser declined a valid file"
    np.testing.assert_allclose(
        np.asarray(nat, np.float64), np.asarray(ref, np.float64), rtol=1e-12
    )

    # structural garbage -> native declines, python raises
    assert native.parse_smf_events(b"not a midi file....", 384) is None
