"""HBM-streaming Pallas decode vs the lax.scan reference (interpret mode).

Covers what the fully-resident kernel can't: configs whose dilation groups
exceed one 128-lane ring row, and (on hardware) weights beyond VMEM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from music_tpu.kernels.wavenet_decode import generate_tokens_fused
from music_tpu.kernels.wavenet_decode_hbm import (
    _build_hbm_weights,
    _row_lanes,
    dequantized_params,
    generate_tokens_fused_hbm,
)
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

# 9 layers per dilation group x 16 residual channels = 144 lanes > 128:
# the resident kernel raises NotImplementedError on this shape
WIDE = wn.WaveNetConfig(
    filter_width=2,
    dilations=(1, 2) * 9,
    dilation_channels=8,
    residual_channels=16,
    skip_channels=16,
    quantization_channels=32,
    use_bias=False,
)


def test_hbm_decode_matches_scan():
    params = wn.init_params(jax.random.PRNGKey(0), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 16
    prime = jax.random.randint(jax.random.PRNGKey(1), (1, P), 0, 32)

    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=150, prime_len=P, sample_mode="argmax",
    )
    fused = generate_tokens_fused_hbm(
        params, prime, cfg=TINY, n_steps=150, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_hbm_decode_wide_group_matches_scan():
    """Dilation groups wider than one 128-lane row (the resident kernel's
    hard limit, wavenet_decode.py _grouping) decode correctly."""
    assert _row_lanes(WIDE) == 256
    params = wn.init_params(jax.random.PRNGKey(3), WIDE)
    P = WIDE.receptive_field + max(WIDE.dilations) + 4
    prime = jax.random.randint(jax.random.PRNGKey(4), (2, P), 0, 32)

    with pytest.raises(NotImplementedError):
        generate_tokens_fused(params, prime, cfg=WIDE, n_steps=8, interpret=True)

    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=WIDE, n_steps=60, prime_len=P, sample_mode="argmax",
    )
    fused = generate_tokens_fused_hbm(
        params, prime, cfg=WIDE, n_steps=60, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_hbm_decode_multigroup_matches_scan():
    """n_stream_groups=G serves G*S independent streams from one kernel
    (the serving-depth path past the 16-stream sublane-tile ceiling):
    every group's tokens must match the scan reference exactly."""
    params = wn.init_params(jax.random.PRNGKey(5), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    # 3 distinct real streams spread across two groups of 8
    prime = jax.random.randint(jax.random.PRNGKey(6), (10, P), 0, 32)

    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=140, prime_len=P, sample_mode="argmax",
    )
    fused = generate_tokens_fused_hbm(
        params, prime, cfg=TINY, n_steps=140, interpret=True,
        n_stream_groups=2,
    )
    assert fused.shape == (10, 140)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_hbm_decode_nonmultiple_of_128():
    params = wn.init_params(jax.random.PRNGKey(2), TINY)
    P = TINY.receptive_field + max(TINY.dilations)
    prime = jnp.full((1, P), 16, jnp.int32)
    out = generate_tokens_fused_hbm(
        params, prime, cfg=TINY, n_steps=37, interpret=True
    )
    assert out.shape == (1, 37)
    assert (out >= 0).all() and (out < 32).all()


def test_hbm_decode_bf16_16_stream_interpret():
    params = wn.init_params(jax.random.PRNGKey(7), TINY)
    P = TINY.receptive_field + max(TINY.dilations)
    prime = jax.random.randint(jax.random.PRNGKey(8), (3, P), 0, 32)
    out = generate_tokens_fused_hbm(
        params, prime, cfg=TINY, n_steps=20, interpret=True,
        n_streams=16, dtype=jnp.bfloat16,
    )
    assert out.shape == (3, 20)
    assert (out >= 0).all() and (out < 32).all()


def test_hbm_decode_int8_matches_dequantized_scan():
    """weight_dtype=int8 streams weight-only-quantized packs; the exact
    reference is the scan decoder run on the dequantized pytree."""
    params = wn.init_params(jax.random.PRNGKey(0), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 16
    prime = jax.random.randint(jax.random.PRNGKey(1), (1, P), 0, 32)

    dq = dequantized_params(params, TINY)
    # quantization must actually coarsen the weights...
    assert not np.allclose(np.asarray(dq["fg"]), np.asarray(params["fg"]))
    # ...and be idempotent: requantizing the dequantized pytree reproduces
    # the same int8 packs (so priming from dq == priming from params
    # modulo the prime-state convs).
    w0 = _build_hbm_weights(params, TINY, weight_dtype=jnp.int8)
    w1 = _build_hbm_weights(dq, TINY, weight_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(w0["gate"]), np.asarray(w1["gate"]))
    np.testing.assert_array_equal(np.asarray(w0["proj"]), np.asarray(w1["proj"]))
    np.testing.assert_array_equal(np.asarray(w0["post"]), np.asarray(w1["post"]))

    ref = wn.generate_tokens(
        dq, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=150, prime_len=P, sample_mode="argmax",
    )
    fused = generate_tokens_fused_hbm(
        dq, prime, cfg=TINY, n_steps=150, interpret=True,
        weight_dtype=jnp.int8,
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_hbm_decode_int8_wide_multigroup():
    """int8 weights compose with wide dilation groups, bf16 activations,
    and multi-group serving."""
    params = wn.init_params(jax.random.PRNGKey(3), WIDE)
    P = WIDE.receptive_field + max(WIDE.dilations) + 4
    prime = jax.random.randint(jax.random.PRNGKey(4), (5, P), 0, 32)

    dq = dequantized_params(params, WIDE)
    ref = wn.generate_tokens(
        dq, prime, jax.random.PRNGKey(0),
        cfg=WIDE, n_steps=60, prime_len=P, sample_mode="argmax",
    )
    # prime from dq so the ring-init convs match the scan reference exactly
    # (idempotent requantization: dq's packs == params' packs, asserted in
    # test_hbm_decode_int8_matches_dequantized_scan)
    fused = generate_tokens_fused_hbm(
        dq, prime, cfg=WIDE, n_steps=60, interpret=True,
        weight_dtype=jnp.int8, n_stream_groups=2,
    )
    assert fused.shape == (5, 60)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))

    out16 = generate_tokens_fused_hbm(
        params, prime, cfg=WIDE, n_steps=20, interpret=True,
        n_streams=16, dtype=jnp.bfloat16, weight_dtype=jnp.int8,
    )
    assert out16.shape == (5, 20)
    assert (out16 >= 0).all() and (out16 < 32).all()


def test_hbm_rings_matches_scan():
    """rings_in_hbm keeps large-dilation ring slots in HBM (aliased ANY
    output) with one-step-ahead tap prefetch; tokens must match the scan
    reference exactly.  min_dilation=2 puts the d=2,4,8 groups in HBM on
    the TINY config so the path is exercised."""
    params = wn.init_params(jax.random.PRNGKey(0), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 16
    prime = jax.random.randint(jax.random.PRNGKey(1), (1, P), 0, 32)

    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=150, prime_len=P, sample_mode="argmax",
    )
    hbm = generate_tokens_fused_hbm(
        params, prime, cfg=TINY, n_steps=150, interpret=True,
        rings_in_hbm=True, hbm_ring_min_dilation=2,
    )
    np.testing.assert_array_equal(np.asarray(hbm), np.asarray(ref))


def test_hbm_rings_multigroup_matches_scan():
    """HBM ring state composes with serving groups (its whole point —
    the VMEM ring cost no longer bounds n_stream_groups)."""
    params = wn.init_params(jax.random.PRNGKey(5), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    prime = jax.random.randint(jax.random.PRNGKey(6), (12, P), 0, 32)

    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=140, prime_len=P, sample_mode="argmax",
    )
    hbm = generate_tokens_fused_hbm(
        params, prime, cfg=TINY, n_steps=140, interpret=True,
        n_stream_groups=2, rings_in_hbm=True, hbm_ring_min_dilation=2,
    )
    assert hbm.shape == (12, 140)
    np.testing.assert_array_equal(np.asarray(hbm), np.asarray(ref))


def test_hbm_rings_wide_streams_match_scan():
    """n_streams > 16 (wide sublane tiles) is the stream-shape lever for
    the marginal serving-group cost (VERDICT r4 #3): at fixed total
    streams, fewer/wider groups batch the per-layer matmuls across the
    sublane dim.  The kernel is shape-generic; exactness must hold at any
    (S, G) split."""
    params = wn.init_params(jax.random.PRNGKey(5), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    prime = jax.random.randint(jax.random.PRNGKey(6), (64, P), 0, 32)

    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=100, prime_len=P, sample_mode="argmax",
    )
    for S, G in [(64, 1), (32, 2)]:
        wide = generate_tokens_fused_hbm(
            params, prime, cfg=TINY, n_steps=100, interpret=True,
            n_streams=S, n_stream_groups=G,
            rings_in_hbm=True, hbm_ring_min_dilation=3,
        )
        np.testing.assert_array_equal(np.asarray(wide), np.asarray(ref))


def test_hbm_rings_192_tile_pads_ragged_request():
    """The round-5b planner emits one S=192 tile for 128 < n <= 192
    requests (plan_fused_serving); the wrapper must pad a ragged row
    count up to the tile and hand back exactly the requested rows,
    token-exact vs the scan decoder."""
    params = wn.init_params(jax.random.PRNGKey(5), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 8
    prime = jax.random.randint(jax.random.PRNGKey(7), (160, P), 0, 32)

    ref = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=60, prime_len=P, sample_mode="argmax",
    )
    wide = generate_tokens_fused_hbm(
        params, prime, cfg=TINY, n_steps=60, interpret=True,
        n_streams=192, n_stream_groups=1,
        rings_in_hbm=True, hbm_ring_min_dilation=3,
    )
    assert wide.shape == (160, 60)
    np.testing.assert_array_equal(np.asarray(wide), np.asarray(ref))


def test_hbm_decode_int8_matmul_trained_model_agreement():
    """int8_matmul quantizes activations dynamically (weight-only
    exactness no longer holds), so the correctness statement is
    behavioral: on a trained model with confident argmax margins the
    quantized chain reproduces the full-precision tokens.  A random-
    weights model is NOT expected to agree — its near-tie logit gaps make
    the chain diverge under any arithmetic change (see
    docs/DIVERGENCES.md, fused-vs-scan note)."""
    import optax

    params = wn.init_params(jax.random.PRNGKey(0), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 16
    pat = np.tile(np.arange(8).repeat(3), 400)[: TINY.receptive_field + 256]
    toks = jnp.asarray(pat, jnp.int32)[None]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(wn.loss_fn)(p, toks, TINY)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for _ in range(120):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.1, float(loss)

    prime = jnp.asarray(pat[:P], jnp.int32)[None]
    full = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=150, prime_len=P, sample_mode="argmax",
    )
    q8 = generate_tokens_fused_hbm(
        params, prime, cfg=TINY, n_steps=150, interpret=True,
        weight_dtype=jnp.int8, int8_matmul=True,
    )
    agreement = float((np.asarray(full) == np.asarray(q8)).mean())
    assert agreement >= 0.99, agreement

    # calibrated static activation scales (no per-step max-reduce; scale
    # folded into the gate column scales at pack time) must match too
    from music_tpu.kernels.wavenet_decode_hbm import calibrate_act_scales

    scales = calibrate_act_scales(params, TINY, toks)
    assert len(scales) == TINY.n_blocks and all(s > 0 for s in scales)
    q8s = generate_tokens_fused_hbm(
        params, prime, cfg=TINY, n_steps=150, interpret=True,
        weight_dtype=jnp.int8, int8_matmul=True, act_scales=scales,
    )
    agreement_s = float((np.asarray(full) == np.asarray(q8s)).mean())
    assert agreement_s >= 0.99, agreement_s


def test_generate_autoselects_hbm_kernel(tmp_path):
    """The public generate() routes wide-group configs (which the resident
    kernel rejects) through the HBM-streaming kernel automatically."""
    from music_tpu.generate.wavenet_generate import generate

    params = wn.init_params(jax.random.PRNGKey(11), WIDE)
    audio = generate(
        cfg=WIDE, params=params, out_path=tmp_path / "wide.wav",
        duration=40 / 16000,
    )
    assert (tmp_path / "wide.wav").exists()
    assert audio.shape == (40,)


def test_hbm_rings_min_dilation_hardware_guard():
    """On hardware (interpret=False) the one-step-ahead tap prefetch races
    the previous step's ring write for d < 3 — the wrapper must refuse
    instead of producing silently wrong tokens (ADVICE r2)."""
    params = wn.init_params(jax.random.PRNGKey(0), TINY)
    P = TINY.receptive_field + max(TINY.dilations) + 16
    prime = jax.random.randint(jax.random.PRNGKey(1), (1, P), 0, 32)
    with pytest.raises(NotImplementedError, match="hbm_ring_min_dilation"):
        generate_tokens_fused_hbm(
            params, prime, cfg=TINY, n_steps=128,
            rings_in_hbm=True, hbm_ring_min_dilation=2,
        )


def test_max_stream_groups_charges_output_tile():
    """The serving planners must charge the VMEM-resident int32 token
    output (ADVICE r2): longer per-call decodes -> fewer groups."""
    from music_tpu.kernels import wavenet_decode as res
    from music_tpu.kernels import wavenet_decode_hbm as hbm

    cfg = wn.WaveNetConfig()  # full-size
    for fn in (res.max_stream_groups, hbm.max_stream_groups,
               hbm.max_stream_groups_hbm_rings):
        g_short = fn(cfg, 16, jnp.bfloat16, n_steps=16_384)
        g_long = fn(cfg, 16, jnp.bfloat16, n_steps=160_000)
        g_legacy = fn(cfg, 16, jnp.bfloat16)
        assert g_short <= g_legacy
        assert g_long < g_short or g_long == 0
    # the 10s/32-stream case the advisor flagged: resident G=2 at 160k
    # steps would need a ~20.5 MB output tile -> must NOT fit
    assert res.max_stream_groups(cfg, 16, jnp.bfloat16, n_steps=160_000) < 2
    # chunked calls restore the round-2 plan
    assert res.max_stream_groups(cfg, 16, jnp.bfloat16, n_steps=16_384) >= 2
