"""HBM-streaming conditioned AE decode vs the scan decoder and the
resident kernel (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from music_tpu.kernels.wavenet_ae_decode_hbm import generate_tokens_fused_hbm
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

# 9 layers x 16 residual channels = 144 lanes > 128: beyond the resident
# kernel's ring-row limit
WIDE = ae.WaveNetAEConfig(
    filter_width=2,
    dilations=(1, 2) * 9,
    en_residual_channel=8,
    en_dilation_channel=8,
    de_residual_channel=16,
    de_dilation_channel=8,
    de_skip_channel=16,
    en_bottleneck_width=12,
    en_pool_kernel_size=16,
    quantization_channel=32,
)


def test_ae_hbm_decode_matches_scan():
    params = ae.init_params(jax.random.PRNGKey(0), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    prime = jax.random.randint(jax.random.PRNGKey(1), (2, P), 0, 32)
    F = 12
    encoding = jax.random.normal(jax.random.PRNGKey(2), (2, F, 12)) * 0.3

    ref = ae.generate_tokens(
        params, encoding, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=100, sample_mode="argmax",
    )
    fused = generate_tokens_fused_hbm(
        params, encoding, prime, cfg=TINY, n_steps=100, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_ae_hbm_rings_multigroup_matches_scan():
    """rings_in_hbm moves large-dilation ring slots to HBM state with
    one-step-ahead tap prefetch (the serving-scale mode); all streams
    must match the scan decoder exactly.  min_dilation=2 exercises the
    path on the tiny config (d=2,4,8 groups in HBM)."""
    params = ae.init_params(jax.random.PRNGKey(11), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    prime = jax.random.randint(jax.random.PRNGKey(12), (9, P), 0, 32)
    F = 10
    encoding = jax.random.normal(jax.random.PRNGKey(13), (9, F, 12)) * 0.3

    ref = ae.generate_tokens(
        params, encoding, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=80, sample_mode="argmax",
    )
    fused = generate_tokens_fused_hbm(
        params, encoding, prime, cfg=TINY, n_steps=80, interpret=True,
        n_stream_groups=2, rings_in_hbm=True, hbm_ring_min_dilation=2,
    )
    assert fused.shape == (9, 80)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_ae_hbm_decode_multigroup_matches_scan():
    """n_stream_groups=2 serves 16 independently-conditioned utterances
    from one kernel; every stream must match the scan decoder exactly."""
    params = ae.init_params(jax.random.PRNGKey(6), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    prime = jax.random.randint(jax.random.PRNGKey(7), (9, P), 0, 32)
    F = 10
    encoding = jax.random.normal(jax.random.PRNGKey(8), (9, F, 12)) * 0.3

    ref = ae.generate_tokens(
        params, encoding, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=80, sample_mode="argmax",
    )
    fused = generate_tokens_fused_hbm(
        params, encoding, prime, cfg=TINY, n_steps=80, interpret=True,
        n_stream_groups=2,
    )
    assert fused.shape == (9, 80)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_ae_hbm_decode_wide_group_matches_scan():
    import pytest

    from music_tpu.kernels.wavenet_ae_decode import (
        generate_tokens_fused as resident,
    )

    params = ae.init_params(jax.random.PRNGKey(3), WIDE)
    P = WIDE.receptive_field + max(WIDE.dilations) + 4
    prime = jax.random.randint(jax.random.PRNGKey(4), (2, P), 0, 32)
    F = 8
    encoding = jax.random.normal(jax.random.PRNGKey(5), (2, F, 12)) * 0.3

    with pytest.raises(NotImplementedError):
        resident(params, encoding, prime, cfg=WIDE, n_steps=8, interpret=True)

    ref = ae.generate_tokens(
        params, encoding, prime, jax.random.PRNGKey(0),
        cfg=WIDE, n_steps=50, sample_mode="argmax",
    )
    fused = generate_tokens_fused_hbm(
        params, encoding, prime, cfg=WIDE, n_steps=50, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_ae_hbm_rings_min_dilation_hardware_guard():
    """interpret=False + hbm_ring_min_dilation < 3 must refuse (the tap
    prefetch races the previous step's ring write for d=1/2; only
    interpret-mode synchronous DMAs make lower values safe)."""
    import pytest

    params = ae.init_params(jax.random.PRNGKey(11), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    prime = jax.random.randint(jax.random.PRNGKey(12), (1, P), 0, 32)
    encoding = jax.random.normal(jax.random.PRNGKey(13), (1, 10, 12)) * 0.3
    with pytest.raises(NotImplementedError, match="hbm_ring_min_dilation"):
        generate_tokens_fused_hbm(
            params, encoding, prime, cfg=TINY, n_steps=64,
            rings_in_hbm=True, hbm_ring_min_dilation=2,
        )


def test_ae_hbm_per_stream_pos_offsets():
    """A vector pos_offset gives every stream its OWN utterance clock on
    the HBM kernel too (per-stream frame-row DMAs): a multi-group call
    with staggered offsets must match per-stream shared-clock calls —
    the capability that lets AEDecodeSession plan onto the HBM kernel
    past the resident kernel's 8 streams (VERDICT r3 #2)."""
    params = ae.init_params(jax.random.PRNGKey(20), TINY)
    need = TINY.receptive_field + max(TINY.dilations)
    rng = np.random.default_rng(21)
    n = 9  # 2 groups of 8, last group ragged
    primes = jnp.asarray(rng.integers(0, 32, (n, need)), jnp.int32)
    F = 40
    encs = jnp.asarray(rng.normal(size=(n, F, 12)) * 0.3, jnp.float32)
    offs = tuple(int(v) for v in rng.integers(0, 8, n) * 16 + rng.integers(0, 3, n))

    n_steps = 120
    for extra in (
        {"n_stream_groups": 2},
        {"n_stream_groups": 2, "rings_in_hbm": True, "hbm_ring_min_dilation": 2},
    ):
        together = generate_tokens_fused_hbm(
            params, encs, primes, cfg=TINY, n_steps=n_steps,
            pos_offset=jnp.asarray(offs, jnp.int32), interpret=True, **extra,
        )
        for i in (0, 3, 7, 8):
            alone = generate_tokens_fused_hbm(
                params, encs[i : i + 1], primes[i : i + 1], cfg=TINY,
                n_steps=n_steps, pos_offset=offs[i], interpret=True,
            )
            np.testing.assert_array_equal(
                np.asarray(together[i]), np.asarray(alone[0]),
                err_msg=f"stream {i} extra={extra}",
            )


def test_ae_hbm_wide_streams_match_scan():
    """n_streams > native tile (wide sublane tiles): the round-5 WaveNet
    stream-shape A/B showed the marginal serving-group cost is
    small-matmul sublane underutilization, so the AE serving planner can
    widen S instead of adding groups.  The conditioned kernel is
    shape-generic in (S, G); exactness (incl. per-stream clocks and HBM
    rings) must hold at any split."""
    params = ae.init_params(jax.random.PRNGKey(50), TINY)
    need = TINY.receptive_field + max(TINY.dilations)
    rng = np.random.default_rng(51)
    n = 32
    primes = jnp.asarray(rng.integers(0, 32, (n, need)), jnp.int32)
    F = 24
    encs = jnp.asarray(rng.normal(size=(n, F, 12)) * 0.3, jnp.float32)
    offs = jnp.asarray(rng.integers(0, 6, n) * 16 + rng.integers(0, 3, n),
                       jnp.int32)

    ref = None
    for S, G in [(32, 1), (16, 2)]:
        wide = generate_tokens_fused_hbm(
            params, encs, primes, cfg=TINY, n_steps=90,
            pos_offset=offs, interpret=True,
            n_streams=S, n_stream_groups=G,
            rings_in_hbm=True, hbm_ring_min_dilation=2,
        )
        assert wide.shape == (n, 90)
        if ref is None:
            # per-stream reference: the scan decoder rebased per clock
            for i in (0, 9, 31):
                alone = generate_tokens_fused_hbm(
                    params, encs[i : i + 1], primes[i : i + 1], cfg=TINY,
                    n_steps=90, pos_offset=int(offs[i]), interpret=True,
                )
                np.testing.assert_array_equal(
                    np.asarray(wide[i]), np.asarray(alone[0]),
                    err_msg=f"stream {i} S={S}",
                )
            ref = np.asarray(wide)
        else:
            np.testing.assert_array_equal(np.asarray(wide), ref,
                                          err_msg=f"S={S}xG={G}")


def test_ae_hbm_bf16_16_stream_mode():
    """(n_streams=16, bf16) on the HBM-streaming conditioned kernel —
    half the streamed-weight bytes per decoded sample AND 2x sublane
    occupancy.  Row independence: a 5-stream call reproduces the first 5
    rows of a 16-stream call with identical inputs (same program, same
    bf16 rounding per row), incl. per-stream utterance clocks."""
    params = ae.init_params(jax.random.PRNGKey(31), TINY)
    need = TINY.receptive_field + max(TINY.dilations)
    rng = np.random.default_rng(32)
    primes = jnp.asarray(rng.integers(0, 32, (16, need)), jnp.int32)
    F = 30
    encs = jnp.asarray(rng.normal(size=(16, F, 12)) * 0.3, jnp.float32)
    offs = jnp.asarray((rng.integers(0, 4, 16) * 16 + 3), jnp.int32)

    full = generate_tokens_fused_hbm(
        params, encs, primes, cfg=TINY, n_steps=64,
        pos_offset=offs, n_streams=16, dtype=jnp.bfloat16, interpret=True,
    )
    assert full.shape == (16, 64)
    part = generate_tokens_fused_hbm(
        params, encs[:5], primes[:5], cfg=TINY, n_steps=64,
        pos_offset=offs[:5], n_streams=16, dtype=jnp.bfloat16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(part), np.asarray(full[:5]))


def test_ae_hbm_int8_matches_dequantized_scan():
    """weight_dtype=int8 streams weight-only-quantized decoder packs; the
    exact reference is the scan decoder on the dequantized pytree (the
    conditioning tables stay full-precision — they are activations)."""
    from music_tpu.kernels.wavenet_ae_decode_hbm import (
        _build_hbm_weights, dequantized_params,
    )

    params = ae.init_params(jax.random.PRNGKey(40), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    prime = jax.random.randint(jax.random.PRNGKey(41), (2, P), 0, 32)
    F = 12
    encoding = jax.random.normal(jax.random.PRNGKey(42), (2, F, 12)) * 0.3

    dq = dequantized_params(params, TINY)
    # quantization must coarsen the decoder weights but not the
    # conditioning projections...
    assert not np.allclose(np.asarray(dq["fg"]), np.asarray(params["fg"]))
    np.testing.assert_array_equal(
        np.asarray(dq["cond_fg"]), np.asarray(params["cond_fg"])
    )
    # ...and requantization is idempotent (so priming from dq == priming
    # from params modulo the prime-state convs)
    w0 = _build_hbm_weights(params, TINY, jnp.float32, weight_dtype=jnp.int8)
    w1 = _build_hbm_weights(dq, TINY, jnp.float32, weight_dtype=jnp.int8)
    for k in ("gate", "proj", "post"):
        np.testing.assert_array_equal(np.asarray(w0[k]), np.asarray(w1[k]))

    ref = ae.generate_tokens(
        dq, encoding, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=100, sample_mode="argmax",
    )
    fused = generate_tokens_fused_hbm(
        dq, encoding, prime, cfg=TINY, n_steps=100, interpret=True,
        weight_dtype=jnp.int8,
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_ae_hbm_int8_multigroup_rings_per_stream_clocks():
    """int8 weights compose with every serving feature at once: stream
    groups, HBM rings, and per-stream utterance clocks (a staggered
    multi-group int8 call matches per-stream single int8 calls)."""
    from music_tpu.kernels.wavenet_ae_decode_hbm import dequantized_params

    params = ae.init_params(jax.random.PRNGKey(50), TINY)
    need = TINY.receptive_field + max(TINY.dilations)
    rng = np.random.default_rng(51)
    n = 9
    primes = jnp.asarray(rng.integers(0, 32, (n, need)), jnp.int32)
    F = 30
    encs = jnp.asarray(rng.normal(size=(n, F, 12)) * 0.3, jnp.float32)
    offs = tuple(int(v) for v in rng.integers(0, 6, n) * 16 + rng.integers(0, 3, n))

    dq = dequantized_params(params, TINY)
    together = generate_tokens_fused_hbm(
        dq, encs, primes, cfg=TINY, n_steps=90,
        pos_offset=jnp.asarray(offs, jnp.int32), interpret=True,
        weight_dtype=jnp.int8, n_stream_groups=2,
        rings_in_hbm=True, hbm_ring_min_dilation=2,
    )
    for i in (0, 5, 8):
        alone = generate_tokens_fused_hbm(
            dq, encs[i : i + 1], primes[i : i + 1], cfg=TINY,
            n_steps=90, pos_offset=offs[i], interpret=True,
            weight_dtype=jnp.int8,
        )
        np.testing.assert_array_equal(
            np.asarray(together[i]), np.asarray(alone[0]), err_msg=f"stream {i}"
        )

    # bf16x16 activations over int8 weights keep row independence
    p16 = jnp.asarray(rng.integers(0, 32, (16, need)), jnp.int32)
    e16 = jnp.asarray(rng.normal(size=(16, F, 12)) * 0.3, jnp.float32)
    full = generate_tokens_fused_hbm(
        params, e16, p16, cfg=TINY, n_steps=40,
        n_streams=16, dtype=jnp.bfloat16, weight_dtype=jnp.int8,
        interpret=True,
    )
    part = generate_tokens_fused_hbm(
        params, e16[:5], p16[:5], cfg=TINY, n_steps=40,
        n_streams=16, dtype=jnp.bfloat16, weight_dtype=jnp.int8,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(part), np.asarray(full[:5]))
