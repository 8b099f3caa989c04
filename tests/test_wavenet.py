"""WaveNet model correctness: conv primitives vs torch, forward shapes,
scan-decode == full-forward consistency, training signal."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from music_tpu.models import wavenet as wn
from music_tpu.ops.conv import dilated_causal_conv, token_causal_conv

TINY = wn.WaveNetConfig(
    filter_width=2,
    dilations=(1, 2, 4, 8, 1, 2, 4, 8),
    dilation_channels=8,
    residual_channels=8,
    skip_channels=16,
    quantization_channels=32,
    use_bias=False,
)


def test_receptive_field_formula():
    # reference formula wavenet/model.py:43-44 with the shipped config
    full = wn.WaveNetConfig()
    assert full.receptive_field == 4094
    assert TINY.receptive_field == (2 - 1) * (sum(TINY.dilations) + 1) + 1 == 32


def test_dilated_conv_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 50, 8)).astype(np.float32)
    w = rng.standard_normal((2, 8, 12)).astype(np.float32)
    for d in (1, 3, 7):
        ours = np.asarray(dilated_causal_conv(jnp.asarray(x), jnp.asarray(w), dilation=d))
        # torch: conv1d over [B, C, T], weight [out, in, fw], no padding
        tx = torch.from_numpy(x).permute(0, 2, 1)
        tw = torch.from_numpy(w).permute(2, 1, 0)  # [out, in, fw]
        ref = F.conv1d(tx, tw, dilation=d).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_token_conv_equals_onehot_conv():
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 32, (2, 40)).astype(np.int32)
    w = rng.standard_normal((2, 32, 8)).astype(np.float32)
    oh = jax.nn.one_hot(tokens, 32, dtype=jnp.float32)
    a = token_causal_conv(jnp.asarray(tokens), jnp.asarray(w), dilation=2)
    b = dilated_causal_conv(oh, jnp.asarray(w), dilation=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_forward_shapes_and_onehot_parity():
    key = jax.random.PRNGKey(0)
    params = wn.init_params(key, TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 50), 0, 32)
    logits = wn.forward(params, tokens, TINY)
    assert logits.shape == (2, 50 - TINY.receptive_field + 1, 32)
    oh = jax.nn.one_hot(tokens, 32, dtype=jnp.float32)
    logits_oh = wn.forward_onehot(params, oh, TINY)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_oh), rtol=1e-4, atol=1e-5)


def test_scan_decode_matches_full_forward():
    """After the cache warms past the receptive field, teacher-forced scan
    logits must equal the full conv forward exactly (this is the correctness
    contract of the fast decode path, mirroring fast_generate vs model
    equivalence in the reference)."""
    key = jax.random.PRNGKey(3)
    params = wn.init_params(key, TINY)
    T = 80  # > 2 * receptive field of 32
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, T), 0, 32)

    cache = wn.init_cache(TINY, batch=1)
    step_logits = []
    for t in range(T):
        cache, logits = wn.decode_step(params, cache, tokens[:, t], TINY)
        step_logits.append(logits)
    step_logits = jnp.stack(step_logits, axis=1)  # [1, T, Q]; entry t predicts t+1

    full = wn.forward(params, tokens, TINY)  # [1, T - rf + 1, Q]
    # full[:, j] is the prediction after consuming tokens[..., j + rf - 1]
    # compare on the tail where the scan ring buffers are fully warm
    rf = TINY.receptive_field
    warm = 2 * rf  # all recursive dependencies in-range
    ours = step_logits[:, warm - 1 :, :]
    ref = full[:, warm - rf :, :]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_generate_tokens_runs_and_is_deterministic():
    params = wn.init_params(jax.random.PRNGKey(5), TINY)
    prime = jnp.full((1, TINY.receptive_field), 16, jnp.int32)
    out1 = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=64, prime_len=TINY.receptive_field,
    )
    out2 = wn.generate_tokens(
        params, prime, jax.random.PRNGKey(0),
        cfg=TINY, n_steps=64, prime_len=TINY.receptive_field,
    )
    assert out1.shape == (1, 64)
    assert (out1 >= 0).all() and (out1 < 32).all()
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_generate_batch_serving_surface(tmp_path):
    """generate_batch serves n independent streams (scan path off-TPU) and
    writes one wav per stream — the serving entry the reference never had."""
    from music_tpu.generate.wavenet_generate import generate_batch

    params = wn.init_params(jax.random.PRNGKey(9), TINY)
    n = 3
    audio = generate_batch(
        cfg=TINY, params=params, n=n, out_dir=tmp_path,
        duration=48 / 16000, seed=7,
    )
    assert audio.shape == (n, 48)
    for i in range(n):
        assert (tmp_path / f"gen_{i:03d}.wav").exists()
    # categorical sampling from per-stream PRNG folds: streams differ
    assert not np.allclose(audio[0], audio[1]) or not np.allclose(audio[1], audio[2])


def test_generate_batch_sharded_over_data_mesh():
    """Serving scale-out: rows shard over a 4-device data mesh, one decode
    program per device, per-device PRNG streams; deterministic."""
    import jax as _jax

    from music_tpu.generate.wavenet_generate import generate_batch
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=4), devices=_jax.devices()[:4])
    params = wn.init_params(jax.random.PRNGKey(10), TINY)
    audio = generate_batch(
        cfg=TINY, params=params, n=6, duration=40 / 16000, mesh=mesh, seed=3,
    )
    assert audio.shape == (6, 40)
    audio2 = generate_batch(
        cfg=TINY, params=params, n=6, duration=40 / 16000, mesh=mesh, seed=3,
    )
    np.testing.assert_array_equal(audio, audio2)
    # devices draw from distinct PRNG streams: not all rows identical
    assert not all(np.array_equal(audio[0], audio[i]) for i in range(1, 6))


def test_loss_decreases_on_tiny_problem():
    import optax

    cfg = TINY
    params = wn.init_params(jax.random.PRNGKey(6), cfg)
    # learnable synthetic data: repeating ramp
    t = np.arange(200)
    tokens = jnp.asarray((t % 32)[None].repeat(2, 0), jnp.int32)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(wn.loss_fn)(params, tokens, cfg)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses


def test_dilated_conv_fuse_taps_equivalent():
    """fuse_taps gathers the fw taps into ONE GEMM (the train-step MFU win,
    docs/BENCHMARKS.md "Training GEMM width A/B") — same math, reassociated
    adds only."""
    from music_tpu.ops.conv import dilated_causal_conv

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 12))
    b = jax.random.normal(jax.random.PRNGKey(2), (12,))
    for d in (1, 2, 4):
        ref = dilated_causal_conv(x, w, b, dilation=d)
        fused = dilated_causal_conv(x, w, b, dilation=d, fuse_taps=True)
        assert fused.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-6
        )
