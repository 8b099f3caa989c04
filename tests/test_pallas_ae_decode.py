"""Fused conditioned AE decode vs the scan decoder (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from music_tpu.kernels.wavenet_ae_decode import generate_tokens_fused
from music_tpu.models import wavenet_ae as ae

TINY = ae.WaveNetAEConfig(
    filter_width=2,
    dilations=(1, 2, 4, 8, 1, 2, 4, 8),
    en_residual_channel=8,
    en_dilation_channel=8,
    de_residual_channel=8,
    de_dilation_channel=8,
    de_skip_channel=16,
    en_bottleneck_width=12,
    en_pool_kernel_size=16,
    quantization_channel=32,
)


def test_fused_ae_decode_matches_scan():
    params = ae.init_params(jax.random.PRNGKey(0), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8  # 47; frame size 16
    prime = jax.random.randint(jax.random.PRNGKey(1), (2, P), 0, 32)
    F = 12
    encoding = jax.random.normal(jax.random.PRNGKey(2), (2, F, 12)) * 0.3

    ref = ae.generate_tokens(
        params, encoding, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=100, sample_mode="argmax",
    )
    fused = generate_tokens_fused(
        params, encoding, prime, cfg=TINY, n_steps=100, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_ae_chunked_decode_matches_single_call():
    """Chunked conditioned decode (_chunked_ae_fused): tail re-priming with
    dynamic pos_offset AND fixed-width encoding-frame slices must match one
    long call exactly — the frame conditioning stays on the utterance clock
    while the per-call VMEM cond tables stay bounded (ADVICE r2 long-decode
    budget, AE variant)."""
    from music_tpu.generate.wavenet_ae_generate import _chunked_ae_fused

    params = ae.init_params(jax.random.PRNGKey(3), TINY)
    need = TINY.receptive_field + max(TINY.dilations)
    prime = jax.random.randint(jax.random.PRNGKey(4), (2, need), 0, 32)
    F = 80  # long utterance: many more frames than one chunk needs
    encoding = jax.random.normal(jax.random.PRNGKey(5), (2, F, 12)) * 0.3

    n_steps = 200
    one = generate_tokens_fused(
        params, encoding, prime, cfg=TINY, n_steps=n_steps, interpret=True
    )
    for slice_frames in (False, True):
        chunked = _chunked_ae_fused(
            generate_tokens_fused, params, encoding, prime, cfg=TINY,
            n_steps=n_steps, step_chunk=64, slice_frames=slice_frames,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(chunked), np.asarray(one))


def test_ae_stream_groups_match_single_group():
    """n_stream_groups=2 (16 streams, one kernel) must reproduce each
    group's streams exactly as the G=1 kernel serves them — rings, cond
    tables, and clocks are per-group (the WaveNet interleaved-group
    scheme ported to the conditioned AE kernel), incl. per-stream
    utterance clocks spanning both groups."""
    params = ae.init_params(jax.random.PRNGKey(11), TINY)
    need = TINY.receptive_field + max(TINY.dilations)
    rng = np.random.default_rng(12)
    B = 11  # partial second group — wrapper pads to 16
    primes = jnp.asarray(rng.integers(0, 32, (B, need)), jnp.int32)
    F = 40
    encs = jnp.asarray(rng.normal(size=(B, F, 12)) * 0.3, jnp.float32)
    offs = jnp.asarray((rng.integers(0, 6, B) * 32), jnp.int32)

    n_steps = 150
    together = generate_tokens_fused(
        params, encs, primes, cfg=TINY, n_steps=n_steps,
        pos_offset=offs, n_stream_groups=2, interpret=True,
    )
    assert together.shape == (B, n_steps)
    for lo in (0, 8):
        hi = min(lo + 8, B)
        alone = generate_tokens_fused(
            params, encs[lo:hi], primes[lo:hi], cfg=TINY,
            n_steps=n_steps, pos_offset=offs[lo:hi], interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(together[lo:hi]), np.asarray(alone),
            err_msg=f"group rows {lo}:{hi}",
        )


def test_ae_bf16_16_stream_mode():
    """The (n_streams=16, bf16) mode — 2x sublane occupancy, the WaveNet
    kernels' bf16 tiling rule ported to the conditioned kernel.  Streams
    are independent rows, so a 3-stream call must reproduce the first 3
    rows of a 16-stream call with identical inputs (same program, same
    bf16 rounding per row); exactness vs f32 is not expected."""
    params = ae.init_params(jax.random.PRNGKey(21), TINY)
    need = TINY.receptive_field + max(TINY.dilations)
    rng = np.random.default_rng(22)
    primes = jnp.asarray(rng.integers(0, 32, (16, need)), jnp.int32)
    F = 30
    encs = jnp.asarray(rng.normal(size=(16, F, 12)) * 0.3, jnp.float32)
    offs = jnp.asarray((rng.integers(0, 4, 16) * 16), jnp.int32)

    full = generate_tokens_fused(
        params, encs, primes, cfg=TINY, n_steps=80,
        pos_offset=offs, n_streams=16, dtype=jnp.bfloat16, interpret=True,
    )
    assert full.shape == (16, 80)
    part = generate_tokens_fused(
        params, encs[:3], primes[:3], cfg=TINY, n_steps=80,
        pos_offset=offs[:3], n_streams=16, dtype=jnp.bfloat16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(part), np.asarray(full[:3]))


def test_ae_per_stream_pos_offsets():
    """A vector pos_offset gives every stream its OWN utterance clock: a
    2-stream call with offsets (0, 96) must match two single-stream calls
    with the matching scalar offsets — the conditioning refresh fires on
    any stream's frame boundary and selects frames per stream
    (AEDecodeSession's enabling kernel feature)."""
    params = ae.init_params(jax.random.PRNGKey(7), TINY)
    need = TINY.receptive_field + max(TINY.dilations)
    rng = np.random.default_rng(8)
    primes = jnp.asarray(rng.integers(0, 32, (2, need)), jnp.int32)
    F = 40
    encs = jnp.asarray(rng.normal(size=(2, F, 12)) * 0.3, jnp.float32)
    offs = (0, 96)  # stream 1 sits mid-utterance, not frame-aligned to 0

    n_steps = 150
    together = generate_tokens_fused(
        params, encs, primes, cfg=TINY, n_steps=n_steps,
        pos_offset=jnp.asarray(offs, jnp.int32), interpret=True,
    )
    for i, off in enumerate(offs):
        alone = generate_tokens_fused(
            params, encs[i : i + 1], primes[i : i + 1], cfg=TINY,
            n_steps=n_steps, pos_offset=off, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(together[i]), np.asarray(alone[0]), err_msg=f"stream {i}"
        )
