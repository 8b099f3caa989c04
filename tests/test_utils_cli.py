"""Vis, profiling, config-loading, and CLI smoke tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from music_tpu.core.config import Schema, Field, load_params_dir
from music_tpu.core.metrics import MetricsLogger
from music_tpu.utils.visualize import get_loss, plot_loss


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
