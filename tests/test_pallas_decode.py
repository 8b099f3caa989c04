"""Fused Pallas decode vs the lax.scan reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from music_tpu.kernels.wavenet_decode import generate_tokens_fused
from music_tpu.models import wavenet as wn

TINY = wn.WaveNetConfig(
    filter_width=2,
    dilations=(1, 2, 4, 8, 1, 2, 4, 8),
    dilation_channels=8,
    residual_channels=8,
    skip_channels=16,
    quantization_channels=32,
    use_bias=False,
)


def test_fused_decode_matches_scan():
    params = wn.init_params(jax.random.PRNGKey(0), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 16  # 55
    prime = jax.random.randint(jax.random.PRNGKey(1), (1, P), 0, 32)

    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=150, prime_len=P, sample_mode="argmax",
    )
    fused = generate_tokens_fused(
        params, prime, cfg=TINY, n_steps=150, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_fused_decode_multigroup_matches_scan():
    """n_stream_groups=2 serves 16 streams from one resident kernel; every
    stream must match the scan reference exactly (serving-depth path)."""
    params = wn.init_params(jax.random.PRNGKey(4), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    prime = jax.random.randint(jax.random.PRNGKey(5), (11, P), 0, 32)

    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=140, prime_len=P, sample_mode="argmax",
    )
    fused = generate_tokens_fused(
        params, prime, cfg=TINY, n_steps=140, interpret=True,
        n_stream_groups=2,
    )
    assert fused.shape == (11, 140)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_fused_decode_nonmultiple_of_128():
    params = wn.init_params(jax.random.PRNGKey(2), TINY)
    P = TINY.receptive_field + max(TINY.dilations)
    prime = jnp.full((1, P), 16, jnp.int32)
    out = generate_tokens_fused(params, prime, cfg=TINY, n_steps=37, interpret=True)
    assert out.shape == (1, 37)
    assert (out >= 0).all() and (out < 32).all()


def test_fused_decode_16_stream_bf16_mode_interpret():
    """The parametrized (n_streams=16, bf16) mode runs and produces valid
    tokens (exactness vs f32 is not expected; distributional parity is
    verified on hardware in benchmarks)."""
    import jax.numpy as jnp

    params = wn.init_params(jax.random.PRNGKey(7), TINY)
    P = TINY.receptive_field + max(TINY.dilations)
    prime = jax.random.randint(jax.random.PRNGKey(8), (3, P), 0, 32)
    out = generate_tokens_fused(
        params, prime, cfg=TINY, n_steps=20, interpret=True,
        n_streams=16, dtype=jnp.bfloat16,
    )
    assert out.shape == (3, 20)
    assert (out >= 0).all() and (out < 32).all()


def test_chunked_fused_decode_matches_single_call():
    """Long decodes are split into bounded-output kernel calls re-primed
    from the previous tail (generate/_chunked_fused, ADVICE r2: the VMEM
    token output tile grows with n_steps).  Argmax chunked == unchunked
    exactly, since prime_len = receptive_field + max dilation rebuilds the
    full ring state."""
    import functools

    from music_tpu.generate.wavenet_generate import _chunked_fused

    params = wn.init_params(jax.random.PRNGKey(2), TINY)
    P = TINY.receptive_field + max(TINY.dilations)
    prime = jax.random.randint(jax.random.PRNGKey(3), (1, P), 0, 32)

    fn = functools.partial(generate_tokens_fused, interpret=True)
    one_call = _chunked_fused(
        fn, params, prime, cfg=TINY, n_steps=300, seed=0, step_chunk=4096
    )
    chunked = _chunked_fused(
        fn, params, prime, cfg=TINY, n_steps=300, seed=0, step_chunk=128
    )
    assert chunked.shape == (1, 300)
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(one_call))
