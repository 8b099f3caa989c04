"""Vis, profiling, config-loading, and CLI smoke tests."""

import json

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from music_tpu.core.config import Schema, Field, load_params_dir
from music_tpu.core.metrics import MetricsLogger
from music_tpu.utils.visualize import get_loss, plot_loss

pytestmark = pytest.mark.fast  # seconds-fast regression tier (pytest -m fast)


def test_loss_log_roundtrip_with_vis(tmp_path):
    logger = MetricsLogger(tmp_path, echo=False)
    for step, loss in [(100, 3.2), (200, 2.9), (300, 2.5)]:
        logger.log_loss(0, step, loss)
    steps, losses = get_loss(tmp_path / "loss_log.log")
    assert steps == [100, 200, 300]
    np.testing.assert_allclose(losses, [3.2, 2.9, 2.5])
    out = plot_loss(tmp_path / "loss_log.log", tmp_path / "loss.png")
    assert out.exists() if hasattr(out, "exists") else (tmp_path / "loss.png").exists()
    assert logger.last_step() == 300


def test_schema_derived_fields():
    schema = Schema(
        fields={"num_filters": Field(list), "hidden": Field(int, 32)},
        derived={"goal_out_size": lambda c: sum(c["num_filters"])},
    )
    cfg = schema.resolve({"num_filters": [100, 200]})
    assert cfg["goal_out_size"] == 300 and cfg["hidden"] == 32


def test_shipped_params_dirs_load():
    from pathlib import Path

    root = Path("music_tpu/params")
    for d in root.iterdir():
        p = load_params_dir(d)
        assert p, d


def test_phase_fractions():
    import optax

    from music_tpu.utils.profiling import phase_fractions

    def loss_fn(params, batch):
        return jnp.mean((batch @ params["w"]) ** 2)

    params = {"w": jnp.ones((8, 4))}
    batch = jnp.ones((16, 8))
    tx = optax.adam(1e-3)
    fr = phase_fractions(loss_fn, params, batch, tx, tx.init(params), n_iters=2)
    assert abs(fr["forward_frac"] + fr["backward_frac"] + fr["optimizer_frac"] - 1.0) < 1e-6


def test_cli_help_and_vis(tmp_path, capsys):
    import pytest

    from music_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["--help"])
    log = tmp_path / "loss_log.log"
    log.write_text("Trained over 10 pieces,Average loss is 1.5\n")
    main(["vis", "loss", "--log", str(log), "--out", str(tmp_path / "l.png")])
    assert (tmp_path / "l.png").exists()


def test_split_corpus(tmp_path):
    """Reference split-artifact parity: train/eval/gen/test_corpus.npy
    (leak_gan/data/ ships [10000/1274/128/128] of an 11274-row corpus)."""
    from music_tpu.data.tokens import split_corpus

    corpus = np.arange(200 * 4, dtype=np.int64).reshape(200, 4)
    splits = split_corpus(corpus, gen_size=16, test_size=16, seed=3, out_dir=tmp_path)
    assert len(splits["train"]) + len(splits["eval"]) == 200
    assert len(splits["gen"]) == 16 and len(splits["test"]) == 16
    # train/eval partition is disjoint over rows
    train_ids = {int(r[0]) for r in splits["train"]}
    eval_ids = {int(r[0]) for r in splits["eval"]}
    assert not train_ids & eval_ids
    # gen/test drawn from train
    assert {int(r[0]) for r in splits["gen"]} <= train_ids
    for name in ("train", "eval", "gen", "test"):
        arr = np.load(tmp_path / f"{name}_corpus.npy")
        np.testing.assert_array_equal(arr, splits[name])
    # deterministic
    again = split_corpus(corpus, gen_size=16, test_size=16, seed=3)
    np.testing.assert_array_equal(again["train"], splits["train"])


def test_midi_split_lists(tmp_path):
    """Hash-based train/validation/test file splits replace the reference's
    inline curated lists (c-rnn-gan/download_midi.py:168-633)."""
    from music_tpu.data.midi_scraper import split_files, write_split_lists

    files = [f"classical/bach/piece{i:03d}.mid" for i in range(300)]
    splits = split_files(files, validation_fraction=0.2, test_fraction=0.1, seed=1)
    n = sum(len(v) for v in splits.values())
    assert n == 300
    assert 30 <= len(splits["validation"]) <= 90   # ~60 expected
    assert 10 <= len(splits["test"]) <= 60         # ~30 expected
    # every file in exactly one split; deterministic
    all_files = sorted(splits["train"] + splits["validation"] + splits["test"])
    assert all_files == sorted(files)
    again = split_files(files, validation_fraction=0.2, test_fraction=0.1, seed=1)
    assert again == splits

    # write lists from a real directory tree
    for name in files[:10]:
        p = tmp_path / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"MThd")
    written = write_split_lists(tmp_path, validation_fraction=0.2, test_fraction=0.1)
    listed = []
    for split in ("train", "validation", "test"):
        listed += (tmp_path / f"{split}_files.txt").read_text().split()
    assert sorted(listed) == sorted(str(f) for f in [f[len(""):] for f in files[:10]])


def test_default_midi_sources_config_loads():
    from music_tpu.data.midi_scraper import DEFAULT_SOURCES

    cfg = json.loads(DEFAULT_SOURCES.read_text())
    assert len(cfg["sources"]) >= 15
    assert all(k.startswith("classical/") for k in cfg["sources"])
    assert 0 < cfg["splits"]["validation_fraction"] < 1


def test_cli_leakgan_grows_vocab_to_corpus(tmp_path, capsys):
    """`leakgan train --corpus` with a corpus whose ids exceed the params'
    vocab_size must grow the vocab instead of indexing out of range — the
    reference's own shipped corpus does exactly this (div. #18)."""
    import json

    import numpy as np

    from music_tpu.cli import main

    pd = tmp_path / "params"
    pd.mkdir()
    (pd / "leak_gan_params.json").write_text(json.dumps({
        "vocab_size": 30, "seq_len": 20, "step_size": 4, "goal_size": 4,
        "embed_dim": 8, "hidden_dim": 8, "start_token": 0,
        "filter_sizes": [1, 2, 3], "num_filters": [8, 8, 16],
    }))
    (pd / "train_params.json").write_text(json.dumps({
        "batch_size": 4, "m_lr": 1e-3, "w_lr": 1e-3, "d_lr": 1e-4,
        "decay_step_size": 100, "decay_rate": 0.99, "rollout_num": 2,
        "generated_num": 4, "seed": 0,
    }))
    corpus = np.random.default_rng(0).integers(1, 41, (8, 20)).astype(np.int64)
    np.save(tmp_path / "corpus.npy", corpus)
    main([
        "leakgan", "train", "--params-dir", str(pd),
        "--corpus", str(tmp_path / "corpus.npy"),
        "--pretrain-g-epochs", "1", "--pretrain-d-epochs", "1",
        "--adversarial-epochs", "1",
    ])
    out = capsys.readouterr().out
    assert "using vocab_size=41" in out
    assert "epoch 0" in out
