"""C-RNN-GAN + MIDI pipeline: SMF roundtrip, event semantics, model shapes,
pretrain/GAN steps, end-to-end generate-to-midi."""

import numpy as np
import jax
import jax.numpy as jnp

from music_tpu.data import midi
from music_tpu.models import crnngan as cg
from music_tpu.train.crnngan_train import CRnnGanTrainConfig, CRnnGanTrainer, FeatureScaler

CFG = cg.CRnnGanConfig(noise_dim=8, hidden_dim=16, song_length=12)


def test_tone_freq_roundtrip():
    for tone in [0, 21, 60, 69, 108, 127]:
        assert midi.freq_to_tone(midi.tone_to_freq(tone)) == tone
    assert abs(midi.tone_to_freq(69) - 440.0) < 1e-9


def test_midi_write_read_roundtrip(tmp_path):
    events = np.array(
        [
            [0, 96, midi.tone_to_freq(60), 80],
            [96, 48, midi.tone_to_freq(64), 90],
            [96, 48, midi.tone_to_freq(67), 100],
        ],
        np.float32,
    )
    path = tmp_path / "x.mid"
    midi.events_to_midi(events, path, ticks_per_quarter_note=384)
    song = midi.midi_to_song_data(path, output_ticks_per_quarter_note=384)
    arr = np.asarray(song)
    assert arr.shape == (3, 4)
    # begin ticks are absolute in song_data: 0, 96, 192
    np.testing.assert_allclose(arr[:, midi.BEGIN_TICK], [0, 96, 192], atol=1e-6)
    np.testing.assert_allclose(arr[:, midi.LENGTH], [96, 48, 48], atol=1e-6)
    np.testing.assert_allclose(
        arr[:, midi.FREQ],
        [midi.tone_to_freq(60), midi.tone_to_freq(64), midi.tone_to_freq(67)],
        rtol=1e-6,
    )
    np.testing.assert_allclose(arr[:, midi.VELOCITY], [80, 90, 100])


def test_song_to_tensor_delta_encoding():
    song = [[0, 10, 440.0, 64], [96, 10, 440.0, 64], [240, 10, 440.0, 64]]
    t = midi.song_to_tensor(song, song_length=3)
    np.testing.assert_allclose(t[:, midi.BEGIN_TICK], [0, 96, 144])


def test_generator_shapes():
    params = cg.init_generator(jax.random.PRNGKey(0), CFG)
    out = cg.generate(params, jax.random.PRNGKey(1), CFG, batch=3)
    assert out.shape == (3, 12, 4)
    real = jax.random.normal(jax.random.PRNGKey(2), (3, 12, 4))
    tf = cg.generator_teacher_forced(params, jax.random.PRNGKey(3), real, CFG)
    assert tf.shape == (3, 12, 4)


def test_discriminator_shapes():
    params = cg.init_discriminator(jax.random.PRNGKey(0), CFG)
    events = jax.random.normal(jax.random.PRNGKey(1), (3, 12, 4))
    dec, feat = cg.discriminator_forward(params, events, CFG)
    assert dec.shape == (3, 12)
    assert feat.shape == (3, 12, 2 * CFG.hidden_dim)
    assert ((dec > 0) & (dec < 1)).all()


def test_pretrain_reduces_mse():
    tc = CRnnGanTrainConfig(cfg=CFG, batch_size=4, g_lr=5e-3)
    tr = CRnnGanTrainer(tc, seed=0)
    data = np.random.default_rng(0).normal(size=(16, 12, 4)).astype(np.float32) * 0.1
    l0 = tr.pretrain(data, epochs=1)
    for _ in range(5):
        l = tr.pretrain(data, epochs=1)
    assert l < l0, (l0, l)


def test_gan_epoch_runs_and_freezing_rule():
    tc = CRnnGanTrainConfig(cfg=CFG, batch_size=4)
    tr = CRnnGanTrainer(tc, seed=1)
    data = np.random.default_rng(1).normal(size=(8, 12, 4)).astype(np.float32)
    gl, dl, acc = tr.gan_epoch(data)
    assert np.isfinite(gl) and np.isfinite(dl) and 0.0 <= acc <= 1.0


def test_generate_to_midi(tmp_path):
    from music_tpu.generate.crnngan_generate import generate as gen_midi

    params = cg.init_generator(jax.random.PRNGKey(5), CFG)
    data = np.abs(np.random.default_rng(2).normal(size=(4, 12, 4))).astype(np.float32)
    scaler = FeatureScaler(data)
    events = gen_midi(params, CFG, tmp_path / "gen.mid", scaler=scaler)
    assert events.shape == (12, 4)
    # the written file parses back
    song = midi.midi_to_song_data(tmp_path / "gen.mid")
    assert len(song) == 12


def test_load_midi_dataset(tmp_path):
    d = tmp_path / "classical" / "bach"
    events = np.array([[0, 96, midi.tone_to_freq(60), 80]] * 5, np.float32)
    events[:, 0] = 96
    midi.events_to_midi(events, d / "a.mid")
    midi.events_to_midi(events, d / "b.mid")
    data, metas = midi.load_midi_dataset(tmp_path, song_length=8)
    assert data.shape == (2, 8, 4)
    assert metas[0]["genre"] == "classical" and metas[0]["composer"] == "bach"


def test_meta_onehots():
    """One-hot(genre) ++ one-hot(composer) per song (c-rnn-gan/data.py:151-157)."""
    metas = [
        {"genre": "jazz", "composer": "monk"},
        {"genre": "classical", "composer": "bach"},
        {"genre": "classical", "composer": "monk"},
    ]
    meta, genres, composers = midi.build_meta_onehots(metas)
    assert genres == ["classical", "jazz"] and composers == ["bach", "monk"]
    assert meta.shape == (3, 4)
    np.testing.assert_array_equal(meta.sum(axis=1), [2.0, 2.0, 2.0])
    np.testing.assert_array_equal(meta[1], [1, 0, 1, 0])  # classical+bach
    np.testing.assert_array_equal(meta[2], [1, 0, 0, 1])  # classical+monk


def test_meta_conditioned_generator():
    """meta_dim>0 flows genre/composer one-hots into the generator input;
    different meta rows change the output."""
    cfg = cg.CRnnGanConfig(noise_dim=8, hidden_dim=16, song_length=12, meta_dim=4)
    params = cg.init_generator(jax.random.PRNGKey(0), cfg)
    m1 = jnp.eye(4)[:3]
    m2 = jnp.roll(m1, 1, axis=1)
    out1 = cg.generate(params, jax.random.PRNGKey(1), cfg, batch=3, meta=m1)
    out2 = cg.generate(params, jax.random.PRNGKey(1), cfg, batch=3, meta=m2)
    assert out1.shape == (3, 12, 4)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # unconditioned call defaults to zero meta
    out3 = cg.generate(params, jax.random.PRNGKey(1), cfg, batch=3)
    assert out3.shape == (3, 12, 4)

    tc = CRnnGanTrainConfig(cfg=cfg, batch_size=4, g_lr=5e-3)
    tr = CRnnGanTrainer(tc, seed=0)
    data = np.random.default_rng(0).normal(size=(8, 12, 4)).astype(np.float32) * 0.1
    meta = np.eye(4, dtype=np.float32)[np.arange(8) % 4]
    l0 = tr.pretrain(data, epochs=1, meta=meta)
    for _ in range(5):
        l = tr.pretrain(data, epochs=1, meta=meta)
    assert l < l0, (l0, l)
    gl, dl, acc = tr.gan_epoch(data, meta=meta)
    assert np.isfinite(gl) and np.isfinite(dl)


def test_data_parallel_trainer():
    """dp mode (mirrors tests/test_seqgan.py's dp test): batch + meta shard
    over the data axis, per-shard PRNG, pmean'd grads and gate statistics."""
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    mesh = make_mesh(MeshSpec(data=4, seq=1, model=1), devices=jax.devices()[:4])
    cfg = cg.CRnnGanConfig(noise_dim=8, hidden_dim=16, song_length=12, meta_dim=4)
    tc = CRnnGanTrainConfig(cfg=cfg, batch_size=8, g_lr=5e-3)
    tr = CRnnGanTrainer(tc, seed=0, mesh=mesh)
    data = np.random.default_rng(0).normal(size=(16, 12, 4)).astype(np.float32) * 0.1
    meta = np.eye(4, dtype=np.float32)[np.arange(16) % 4]
    l0 = tr.pretrain(data, epochs=1, meta=meta)
    for _ in range(5):
        l = tr.pretrain(data, epochs=1, meta=meta)
    assert l < l0, (l0, l)
    gl, dl, acc = tr.gan_epoch(data, meta=meta)
    assert np.isfinite(gl) and np.isfinite(dl) and 0.0 <= acc <= 1.0


def test_conditioned_checkpoint_metadim_inference(tmp_path):
    """Generation-time restore infers the conditioning width from the
    trained fc1 shape (cli.py cmd_crnngan generate path)."""
    from music_tpu.core import checkpoint as ckpt_lib

    cfg = cg.CRnnGanConfig(noise_dim=8, hidden_dim=16, song_length=12, meta_dim=4)
    tr = CRnnGanTrainer(CRnnGanTrainConfig(cfg=cfg, batch_size=4), seed=0)
    tr.save(tmp_path, step=1)

    shapes = ckpt_lib.leaf_shapes(tmp_path, prefix="['g_params']")
    in_dim = shapes["['fc1']['w']"][0]
    assert in_dim - cfg.noise_dim - cfg.num_song_features == 4
    example = cg.init_generator(jax.random.PRNGKey(9), cfg)
    restored = ckpt_lib.restore_subtree(tmp_path, example, prefix="['g_params']")
    np.testing.assert_array_equal(
        np.asarray(restored["fc1"]["w"]), np.asarray(tr.g_params["fc1"]["w"])
    )


def test_midi_scraper_with_injected_fetch(tmp_path):
    from music_tpu.data.midi_scraper import download, extract_midi_links

    events = np.array([[0, 96, midi.tone_to_freq(60), 80]], np.float32)
    midi.events_to_midi(events, tmp_path / "src" / "a.mid")
    payload = (tmp_path / "src" / "a.mid").read_bytes()
    pages = {
        "http://x/idx.html": b'<html><a href="files/a.mid">A</a>'
        b'<a href="other.txt">no</a></html>',
        "http://x/files/a.mid": payload,
    }
    links = extract_midi_links(pages["http://x/idx.html"].decode(), "http://x/idx.html")
    assert links == ["http://x/files/a.mid"]

    out = download(
        tmp_path / "corpus",
        {"classical/bach": ["http://x/idx.html"]},
        fetch=lambda url: pages[url],
        delay_seconds=0,
    )
    assert len(out) == 1
    assert out[0].parent.name == "bach"
    # ledger prevents re-download
    out2 = download(
        tmp_path / "corpus",
        {"classical/bach": ["http://x/idx.html"]},
        fetch=lambda url: pages[url],
        delay_seconds=0,
    )
    assert out2 == []


def test_dp_tp_trainer_matches_dp_only():
    """A dp x model mesh hidden-splits the bi-LSTM discriminator
    (parallel/rnn_tp.py) — same seeds must reproduce the dp-only trainer's
    losses to float tolerance."""
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    cfg = cg.CRnnGanConfig(noise_dim=8, hidden_dim=16, song_length=12, meta_dim=4)
    tc = CRnnGanTrainConfig(cfg=cfg, batch_size=8, g_lr=5e-3)
    # NOTE: dp mesh uses 4 devices and the tp mesh all 8 — XLA:CPU's
    # collective rendezvous crashes (Check failed: id < num_threads) when
    # these particular dp and dp x tp executables run in one process on
    # overlapping 2-/4-device prefixes; disjoint group shapes are stable
    # and the semantics are identical
    mesh_dp = make_mesh(MeshSpec(data=4, seq=1, model=1), devices=jax.devices()[:4])
    mesh_tp = make_mesh(MeshSpec(data=4, seq=1, model=2), devices=jax.devices()[:8])
    tr_dp = CRnnGanTrainer(tc, seed=0, mesh=mesh_dp)
    tr_tp = CRnnGanTrainer(tc, seed=0, mesh=mesh_tp)
    assert tr_tp.tp and not tr_dp.tp

    data = np.random.default_rng(0).normal(size=(16, 12, 4)).astype(np.float32) * 0.1
    meta = np.eye(4, dtype=np.float32)[np.arange(16) % 4]
    l_dp = tr_dp.pretrain(data, epochs=2, meta=meta)
    l_tp = tr_tp.pretrain(data, epochs=2, meta=meta)
    np.testing.assert_allclose(l_tp, l_dp, rtol=1e-5)

    g_dp, d_dp, a_dp = tr_dp.gan_epoch(data, meta=meta)
    g_tp, d_tp, a_tp = tr_tp.gan_epoch(data, meta=meta)
    np.testing.assert_allclose(g_tp, g_dp, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(d_tp, d_dp, rtol=1e-3, atol=1e-5)

    # D params live gate-repacked + sharded over `model`
    assert "model" in str(tr_tp.d_params["fwd1"]["wi"].sharding.spec)


def test_tp_checkpoint_layout_stable(tmp_path):
    """TP checkpoints store the torch gate order: a tp-trained checkpoint
    restores into a non-tp trainer bit-identically."""
    from music_tpu.parallel.mesh import MeshSpec, make_mesh

    cfg = cg.CRnnGanConfig(noise_dim=8, hidden_dim=16, song_length=12)
    tc = CRnnGanTrainConfig(cfg=cfg, batch_size=8)
    mesh_tp = make_mesh(MeshSpec(data=4, seq=1, model=2), devices=jax.devices()[:8])
    tr_tp = CRnnGanTrainer(tc, seed=0, mesh=mesh_tp)
    data = np.random.default_rng(1).normal(size=(16, 12, 4)).astype(np.float32) * 0.1
    tr_tp.gan_epoch(data)
    tr_tp.save(tmp_path, 5)

    tr_plain = CRnnGanTrainer(tc, seed=9)
    assert tr_plain.restore(tmp_path) == 5
    events = jnp.asarray(data[:4])
    ref_dec, _ = cg.discriminator_forward(tr_plain.d_params, events, cfg)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from music_tpu.parallel import gan_tp

    tp_fwd = shard_map(
        lambda p, e: gan_tp.crnngan_forward_tp(p, e, cfg),
        mesh=mesh_tp, in_specs=(gan_tp.crnngan_d_specs(), P()), out_specs=P(),
    )
    tp_dec, _ = tp_fwd(tr_tp.d_params, events)
    np.testing.assert_allclose(np.asarray(tp_dec), np.asarray(ref_dec), rtol=2e-5, atol=1e-6)
