"""End-to-end public train() loops (the reference entry points,
wavenet/train.py:76-226 and wavenet_autoencoder/train.py:66-167): JSON
param dicts -> prefetched batches -> sharded steps -> rotating checkpoints
-> log files.  Covers the PrefetchBatches wiring and resume."""

import pickle

import numpy as np

from music_tpu.core import checkpoint as ckpt_lib

TINY_WN = {
    "filter_width": 2,
    "dilations": [1, 2, 4, 8],
    "dilation_channels": 4,
    "residual_channels": 4,
    "skip_channels": 8,
    "quantization_channels": 32,
    "use_bias": False,
}


def _pickle_clips(path, n_clips=3, length=400, q=32, seed=0):
    rng = np.random.default_rng(seed)
    clips = [rng.integers(0, q, (length,)).astype(np.int32) for _ in range(n_clips)]
    with open(path, "wb") as f:
        pickle.dump(clips, f)
    return path


def test_wavenet_train_loop_end_to_end(tmp_path):
    from music_tpu.train.wavenet_train import train

    audio = _pickle_clips(tmp_path / "np_audio.pkl")
    state = train(
        wavenet_params=TINY_WN,
        dataset_params={
            "audio_path": str(audio), "window_length": 32, "batch_size": 8,
        },
        train_params={
            "optimizer": "adam", "learning_rate": 1e-3, "num_epochs": 2,
            "print_every": 2, "seed": 0,
            "log_dir": str(tmp_path / "logs"),
            "restore_dir": str(tmp_path / "ckpt"),
        },
    )
    assert int(state.step) > 0
    # rotating checkpoints + the reference-format loss log exist
    assert ckpt_lib.latest_step(tmp_path / "ckpt") == int(state.step)
    log = (tmp_path / "logs" / "loss_log.log").read_text()
    assert "Average loss" in log

    # resume: a fresh train() run picks up from the checkpoint
    state2 = train(
        wavenet_params=TINY_WN,
        dataset_params={
            "audio_path": str(audio), "window_length": 32, "batch_size": 8,
        },
        train_params={
            "optimizer": "adam", "learning_rate": 1e-3, "num_epochs": 1,
            "print_every": 2, "seed": 1,
            "log_dir": str(tmp_path / "logs"),
            "restore_dir": str(tmp_path / "ckpt"),
        },
    )
    assert int(state2.step) > int(state.step)


def test_train_rejects_out_of_range_codes(tmp_path):
    """A 256-level np_audio.pkl fed to a Q=32 model must raise, not NaN
    (AudioWindows.check_vocab)."""
    import pytest

    from music_tpu.train.wavenet_train import train

    audio = _pickle_clips(tmp_path / "np_audio.pkl", q=256)
    with pytest.raises(ValueError, match="quantization_channels=32"):
        train(
            wavenet_params=TINY_WN,
            dataset_params={
                "audio_path": str(audio), "window_length": 32, "batch_size": 8,
            },
            train_params={
                "optimizer": "adam", "learning_rate": 1e-3, "num_epochs": 1,
                "log_dir": str(tmp_path / "logs"),
                "restore_dir": str(tmp_path / "ckpt"),
            },
        )


def test_wavenet_ae_train_loop_end_to_end(tmp_path):
    from music_tpu.train.wavenet_ae_train import train

    audio = _pickle_clips(tmp_path / "np_audio.pkl", length=300)
    state = train(
        model_params={
            "filter_width": 2,
            "dilations": [1, 2, 4, 8],
            "en_residual_channel": 4,
            "en_dilation_channel": 4,
            "de_residual_channel": 4,
            "de_dilation_channel": 4,
            "de_skip_channel": 8,
            "en_bottleneck_width": 6,
            "en_pool_kernel_size": 4,
            "quantization_channel": 32,
        },
        dataset_params={
            "audio_path": str(audio), "window_length": 24, "batch_size": 8,
        },
        train_params={
            "optimizer": "adam", "learning_rate": 1e-3, "num_epochs": 1,
            "print_every": 2, "seed": 0,
            "log_dir": str(tmp_path / "logs"),
            "restore_dir": str(tmp_path / "ckpt"),
        },
    )
    assert int(state.step) > 0
    assert ckpt_lib.latest_step(tmp_path / "ckpt") is not None
