"""µ-law codec bit-exactness vs the reference formulas.

The reference implementation is torch (wavenet/audio_func.py:5-39); torch
(CPU build) is available in this image, so we check bit-exact agreement
against the formulas transcribed to torch directly, over all 256 code points
and a dense amplitude sweep.
"""

import numpy as np
import jax.numpy as jnp
import torch

from music_tpu.ops.mulaw import mu_law_decode, mu_law_encode, one_hot
import pytest

pytestmark = pytest.mark.fast  # seconds-fast regression tier (pytest -m fast)


def ref_encode(audio: torch.Tensor, q: int = 256) -> torch.Tensor:
    # formula of wavenet/audio_func.py:5-22
    mu = torch.tensor([q - 1]).float()
    safe_abs = torch.abs(torch.clamp(audio, -1.0, 1.0))
    magnitude = torch.log1p(mu * safe_abs) / torch.log1p(mu)
    signal = torch.sign(audio) * magnitude
    return ((signal + 1) / 2 * mu + 0.5).long()


def ref_decode(codes: torch.Tensor, q: int = 256) -> torch.Tensor:
    # formula of wavenet/audio_func.py:24-39
    mu = torch.tensor([q - 1]).float()
    signal = 2.0 * (codes.float() / mu) - 1.0
    magnitude = (1.0 / mu) * ((1.0 + mu) ** torch.abs(signal) - 1.0)
    return torch.sign(signal) * magnitude


def test_encode_matches_reference_dense_sweep():
    audio = np.linspace(-1.2, 1.2, 100_001, dtype=np.float32)
    ours = np.asarray(mu_law_encode(jnp.asarray(audio)))
    ref = ref_encode(torch.from_numpy(audio)).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_decode_bit_exact_all_codes():
    codes = np.arange(256, dtype=np.int32)
    ours = np.asarray(mu_law_decode(jnp.asarray(codes)))
    ref = ref_decode(torch.from_numpy(codes)).numpy()
    np.testing.assert_array_equal(ours, ref)  # bit-exact float32


def test_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    audio = rng.uniform(-1, 1, 10_000).astype(np.float32)
    rec = np.asarray(mu_law_decode(mu_law_encode(jnp.asarray(audio))))
    # µ-law 256-level quantization error bound near full scale
    assert np.max(np.abs(rec - audio)) < 0.06
    assert np.mean(np.abs(rec - audio)) < 0.01


def test_one_hot_intended_layout():
    codes = jnp.asarray([[0, 3, 255]])
    oh = one_hot(codes)
    assert oh.shape == (1, 3, 256)
    assert oh[0, 1, 3] == 1.0 and oh[0, 1].sum() == 1.0
