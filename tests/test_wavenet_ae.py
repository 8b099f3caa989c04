"""WaveNet autoencoder: encoder/decoder shapes, conditioning upsample,
cached generation consistency, training signal."""

import numpy as np
import jax
import jax.numpy as jnp

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
    en_pool_kernel_size=8,
    quantization_channel=32,
)


def test_encode_shapes():
    params = ae.init_params(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 70), 0, 32)
    enc = ae.encode(params, tokens, TINY)
    # causal+dilated valid convs shrink T: 70 -> 70-1-sum(d) = 39 -> pool 8 -> 4
    assert enc.shape == (2, (70 - 1 - sum(TINY.dilations)) // 8, 12)


def test_upsample_cond_nearest():
    enc = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)  # 3 frames
    up = ae._upsample_cond(enc, 6)
    np.testing.assert_array_equal(
        np.asarray(up[0, :, 0]), [0, 0, 2, 2, 4, 4]
    )


def test_forward_and_loss():
    params = ae.init_params(jax.random.PRNGKey(0), TINY)
    T = TINY.receptive_field + 20
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, T), 0, 32)
    logits = ae.forward(params, tokens, TINY)
    assert logits.shape == (2, 21, 32)
    loss = ae.loss_fn(params, tokens, TINY)
    assert np.isfinite(float(loss))


def test_decode_step_matches_full_decode():
    """Teacher-forced scan logits must equal the conv decoder on the tail
    (constant conditioning frame keeps the alignment exact)."""
    params = ae.init_params(jax.random.PRNGKey(3), TINY)
    T = 3 * TINY.receptive_field
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, T), 0, 32)
    # constant encoding (one frame) removes upsample-alignment ambiguity
    enc = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 12))

    cond_fg = jnp.einsum("bfw,lwc->bflc", enc, params["cond_fg"])
    cond_post = jnp.einsum("bfw,wc->bfc", enc, params["cond_post"])
    cache = ae.init_cache(TINY, batch=1)
    logits_steps = []
    for t in range(T):
        cache, logits = ae.decode_step(
            params, cache, tokens[:, t], cond_fg[:, 0], cond_post[:, 0], TINY
        )
        logits_steps.append(logits)
    step_logits = jnp.stack(logits_steps, axis=1)

    full = ae.decode(params, tokens, enc, TINY, output_width=T - TINY.receptive_field + 1)
    rf = TINY.receptive_field
    warm = 2 * rf
    np.testing.assert_allclose(
        np.asarray(step_logits[:, warm - 1 :, :]),
        np.asarray(full[:, warm - rf :, :]),
        rtol=2e-4, atol=2e-5,
    )


def test_generate_tokens_shape():
    params = ae.init_params(jax.random.PRNGKey(6), TINY)
    prime = jnp.full((1, TINY.receptive_field), 16, jnp.int32)
    enc = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 12))
    out = ae.generate_tokens(
        params, enc, prime, jax.random.PRNGKey(8), cfg=TINY, n_steps=40
    )
    assert out.shape == (1, 40)
    assert (out >= 0).all() and (out < 32).all()


def test_training_reduces_loss():
    import optax

    params = ae.init_params(jax.random.PRNGKey(9), TINY)
    t = np.arange(TINY.receptive_field + 40)
    tokens = jnp.asarray((t % 32)[None].repeat(2, 0), jnp.int32)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, grads = jax.value_and_grad(ae.loss_fn)(params, tokens, TINY)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_sharded_ae_loss_matches_unsharded():
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from music_tpu.parallel.mesh import MeshSpec, make_mesh
    from music_tpu.train import wavenet_ae_train as aet

    mesh = make_mesh(MeshSpec(data=2, seq=2, model=2))
    params = ae.init_params(jax.random.PRNGKey(0), TINY)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (4, TINY.receptive_field + 33), 0, 32
    )
    ref_loss, ref_grads = jax.value_and_grad(ae.loss_fn)(params, tokens, TINY)

    loss_fn, specs = aet.make_loss_fn(TINY, mesh)
    sharded = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, {k: specs[k] for k in params},
    )
    toks = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    loss, grads = jax.value_and_grad(loss_fn)(sharded, toks)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for k in ref_grads:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(ref_grads[k]),
            rtol=2e-4, atol=1e-5, err_msg=k,
        )


def test_ae_generate_batch_serving_surface(tmp_path):
    """AE generate_batch reconstructs n source clips concurrently (scan
    path off-TPU) and writes one wav per clip — the serving counterpart of
    wavenet_generate.generate_batch for the conditioned decoder."""
    from music_tpu.generate.wavenet_ae_generate import generate_batch

    params = ae.init_params(jax.random.PRNGKey(11), TINY)
    n, T = 3, TINY.receptive_field + 64
    t = np.arange(T) / 16000.0
    src = np.stack(
        [0.4 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0, 440.0)]
    ).astype(np.float32)
    audio = generate_batch(
        cfg=TINY, params=params, source_audios=src, out_dir=tmp_path
    )
    assert audio.shape == (n, T)
    assert np.isfinite(audio).all()
    for i in range(n):
        assert (tmp_path / f"recon_{i:03d}.wav").exists()


def test_ae_generate_batch_mesh_matches_meshless():
    """A data-mesh AE generate_batch (one conditioned decode program per
    device) must reproduce the meshless batch exactly (argmax scan path
    off TPU), including a ragged final row chunk."""
    from music_tpu.generate.wavenet_ae_generate import generate_batch
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    params = ae.init_params(jax.random.PRNGKey(12), TINY)
    n, T = 5, TINY.receptive_field + 64
    t = np.arange(T) / 16000.0
    src = np.stack(
        [0.4 * np.sin(2 * np.pi * (200.0 + 60.0 * i) * t) for i in range(n)]
    ).astype(np.float32)
    ref = generate_batch(cfg=TINY, params=params, source_audios=src)
    mesh = make_mesh(
        MeshSpec(data=2, seq=1, model=1), devices=jax.devices()[:2]
    )
    got = generate_batch(cfg=TINY, params=params, source_audios=src, mesh=mesh)
    np.testing.assert_array_equal(got, ref)
