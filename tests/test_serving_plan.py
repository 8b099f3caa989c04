"""plan_fused_serving: host-side kernel selection + VMEM group budgets.

Pure arithmetic — seconds-fast coverage of the serving planner's
decision boundaries that the hardware validations exercise end to end
(docs/SERVING.md "Kernel selection")."""

import jax.numpy as jnp

from music_tpu.generate.wavenet_generate import plan_fused_serving
from music_tpu.kernels import wavenet_decode, wavenet_decode_hbm
from music_tpu.models import wavenet as wn
import pytest

pytestmark = pytest.mark.fast  # seconds-fast regression tier (pytest -m fast)

FULL = wn.WaveNetConfig()  # ~5 MB f32 — resident fits
SCALED = wn.WaveNetConfig(
    filter_width=2,
    dilations=(1, 2, 4, 8, 16, 32, 64, 128, 256, 512) * 4,
    dilation_channels=64, residual_channels=64, skip_channels=1024,
    quantization_channels=256, use_bias=False,
)  # 19 MB — weights alone exceed VMEM


def test_full_model_picks_resident():
    fused, S, g, rings = plan_fused_serving(FULL, 16, jnp.bfloat16, 16384, 32)
    assert fused is wavenet_decode.generate_tokens_fused
    assert S == 16 and g == 2 and not rings  # bf16x16 x G2 resident


def test_full_model_upgrades_to_wide_hbm_rings_for_big_n():
    fused, S, g, rings = plan_fused_serving(FULL, 16, jnp.bfloat16, 8192, 128)
    assert fused is wavenet_decode_hbm.generate_tokens_fused_hbm
    # the round-5 shape A/B: the rings upgrade widens the tile (full
    # model W=128 -> S=128, the measured 2.58M samples/s shape)
    assert rings and S == 128 and S * g >= 128


def test_rings_width_clamped_to_request():
    # 40 streams: padded request is 48 (3 base tiles) — the plan must not
    # launch a 128-wide tile for it
    fused, S, g, rings = plan_fused_serving(FULL, 16, jnp.bfloat16, 8192, 40)
    assert fused is wavenet_decode_hbm.generate_tokens_fused_hbm
    assert rings and S == 48 and S * g >= 40


def test_rings_width_jumps_to_192_for_midsize_requests():
    # round-5b composed-capacity probes: one S192 tile steps at 64-69 µs
    # where a second 128-wide group costs 88-124 µs — so 128 < n <= 192
    # widens to one 192 tile.  S160 (the measured Mosaic tiling
    # pathology, 116 µs) must never be emitted.
    for n in (129, 160, 192):
        fused, S, g, rings = plan_fused_serving(FULL, 16, jnp.bfloat16, 8192, n)
        assert fused is wavenet_decode_hbm.generate_tokens_fused_hbm
        assert rings and S == 192 and S * g >= n
    # past 192 the plan returns to the validated 128-wide group ladder
    fused, S, g, rings = plan_fused_serving(FULL, 16, jnp.bfloat16, 8192, 256)
    assert rings and S == 128 and S * g >= 256


def test_scaled_model_skips_resident():
    fused, S, g, rings = plan_fused_serving(SCALED, 8, jnp.float32, 2048, 8)
    assert fused is wavenet_decode_hbm.generate_tokens_fused_hbm
    assert S == 8 and g >= 1 and not rings


def test_scaled_model_wide_width_capped_by_row_lanes():
    # W=256 for the scaled model: serving_stream_width caps at 64 (the
    # S*W ~ 16k lanes optimum), not 128
    assert wavenet_decode_hbm.serving_stream_width(SCALED, jnp.bfloat16) == 64
    assert wavenet_decode_hbm.serving_stream_width(FULL, jnp.bfloat16) == 128
    assert wavenet_decode_hbm.serving_stream_width(FULL, jnp.float32) == 128


def test_output_budget_shrinks_groups():
    # charging a bigger per-call output tile can only shrink the cap
    g_small = plan_fused_serving(FULL, 16, jnp.bfloat16, 2048, 32)[2]
    g_big = plan_fused_serving(FULL, 16, jnp.bfloat16, 16384, 32)[2]
    assert g_big <= g_small


def test_unsupported_config_returns_none():
    # filter_width != 2 is rejected by every fused kernel's _grouping
    odd = wn.WaveNetConfig(
        filter_width=3, dilations=(1, 2) * 40, dilation_channels=32,
        residual_channels=32, skip_channels=512, quantization_channels=256,
    )
    fused, _, _, _ = plan_fused_serving(odd, 8, jnp.float32, 2048, 8)
    assert fused is None


def test_ae_plan_resident_groups_and_hbm_fallback():
    """plan_ae_serving: sub-10 MB decoders get the resident kernel with
    interleaved stream groups (16 rows -> n_stream_groups=2); the
    reference-size AE (12 MB f32) must keep routing to the HBM-streaming
    kernel (wavenet_autoencoder/model1.py:256-268 scale)."""
    import jax

    from music_tpu.generate.wavenet_ae_generate import plan_ae_serving
    from music_tpu.kernels import wavenet_ae_decode as res_k
    from music_tpu.kernels import wavenet_ae_decode_hbm as hbm_k
    from music_tpu.models import wavenet_ae as ae

    tiny = ae.WaveNetAEConfig(
        filter_width=2, dilations=(1, 2, 4, 8, 1, 2, 4, 8),
        en_residual_channel=8, en_dilation_channel=8,
        de_residual_channel=8, de_dilation_channel=8,
        de_skip_channel=16, en_bottleneck_width=12,
        en_pool_kernel_size=16, quantization_channel=32,
    )
    tiny_params = ae.init_params(jax.random.PRNGKey(0), tiny)
    fused, rows, extra = plan_ae_serving(tiny, tiny_params, 16, jnp.float32, 2048)
    assert fused is res_k.generate_tokens_fused
    assert rows == 16 and extra == {"n_stream_groups": 2}
    fused, rows, extra = plan_ae_serving(tiny, tiny_params, 6, jnp.float32, 2048)
    assert fused is res_k.generate_tokens_fused
    assert rows == 8 and extra == {}

    # the REFERENCE-size AE: its 12 MB f32 pytree includes the encoder +
    # cond projections, but the DECODE KERNEL's weights are ~6 MB f32 /
    # ~3 MB bf16 — so one group fits the resident kernel (zero weight
    # streaming) and only multi-group requests go to the HBM kernel
    full = ae.WaveNetAEConfig()
    full_params = ae.init_params(jax.random.PRNGKey(1), full)
    fused, rows, extra = plan_ae_serving(full, full_params, 8, jnp.float32, 4096)
    assert fused is res_k.generate_tokens_fused
    assert rows == 8 and extra == {}
    # multi-tile f32 requests now take the WIDE-tile rings plan (round-5
    # stream-shape A/B: one full sublane tile beats narrow groups)
    fused, rows, extra = plan_ae_serving(full, full_params, 16, jnp.float32, 4096)
    assert fused is hbm_k.generate_tokens_fused_hbm
    assert rows == 16 and extra == {
        "rings_in_hbm": True, "n_streams": 16, "n_stream_groups": 1,
    }

    # bf16 plans the 16-row sublane tile: 16 streams = ONE group — which
    # fits the resident kernel on the reference AE; 32 go to HBM G=2
    fused, rows, extra = plan_ae_serving(full, full_params, 16, jnp.bfloat16, 4096)
    assert fused is res_k.generate_tokens_fused
    assert rows == 16 and extra == {"n_streams": 16}
    fused, rows, extra = plan_ae_serving(full, full_params, 32, jnp.bfloat16, 4096)
    assert fused is hbm_k.generate_tokens_fused_hbm
    assert rows == 32
    assert extra.get("n_streams") == 32 and extra.get("rings_in_hbm") is True
    assert extra.get("n_stream_groups") == 1
    # width caps at serving_stream_width (64): 128 rows -> S64 x G2
    fused, rows, extra = plan_ae_serving(full, full_params, 128, jnp.bfloat16, 4096)
    assert rows == 128
    assert extra.get("n_streams") == 64 and extra.get("n_stream_groups") == 2
    # a ragged request pads to whole native tiles, never past the width
    fused, rows, extra = plan_ae_serving(full, full_params, 40, jnp.bfloat16, 4096)
    assert rows == 48 and extra.get("n_streams") == 48
    fused, rows, extra = plan_ae_serving(tiny, tiny_params, 16, jnp.bfloat16, 2048)
    assert fused is res_k.generate_tokens_fused
    assert rows == 16 and extra == {"n_streams": 16}


def test_chunked_fused_traced_seed_under_mesh():
    """generate_batch's mesh body passes a TRACED seed into _chunked_fused
    (seed_arr[0] + axis_index); the per-chunk seed arithmetic must stay
    trace-safe (a Python `% 2**31` on an int32 tracer raises
    OverflowError).  Exercised here with the interpret resident kernel
    inside a 2-device shard_map, chunked, vs the scan reference."""
    import jax
    import numpy as np

    from music_tpu.generate.wavenet_generate import (
        _chunked_fused, sharded_rows_program,
    )
    from music_tpu.kernels.wavenet_decode import generate_tokens_fused
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    cfg = wn.WaveNetConfig(
        filter_width=2, dilations=(1, 2, 4, 8, 1, 2, 4, 8),
        dilation_channels=8, residual_channels=8, skip_channels=16,
        quantization_channels=32, use_bias=False,
    )
    params = wn.init_params(jax.random.PRNGKey(0), cfg)
    P = cfg.receptive_field + max(cfg.dilations)
    prime = np.random.default_rng(3).integers(0, 32, (4, P)).astype(np.int32)

    ref = wn.generate_tokens(
        params, jnp.asarray(prime), jax.random.PRNGKey(0), cfg=cfg,
        n_steps=64, prime_len=P, sample_mode="argmax",
    )

    mesh = make_mesh(MeshSpec(data=2), devices=jax.devices()[:2])

    def body(p, rows, seed_arr):
        seed = seed_arr[0] + jax.lax.axis_index("data")  # int32 tracer
        return _chunked_fused(
            generate_tokens_fused, p, rows, cfg=cfg, n_steps=64,
            step_chunk=32, seed=seed, interpret=True, sample_mode="argmax",
        )

    sharded = sharded_rows_program(mesh, params, body)
    got = sharded(params, jnp.asarray(prime), jnp.asarray([7], jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
