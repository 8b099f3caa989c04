"""Raw-audio dataset pipeline: wav files -> µ-law pickle -> training windows.

Replaces three reference components with one module (SURVEY.md §2.1):
- dataset build (wavenet/data/generate_audio_dataset.py — split songs into
  >=`duration`-second 16 kHz mono pieces, amplitude-normalize, optional
  silence trim),
- µ-law pickling (wavenet/data/wav_to_numpy.py — ``np_audio.pkl`` holding a
  list of int arrays; artifact format preserved),
- the window slicer + loader (wavenet/faster_audio_data.py).

TPU-first redesign: no worker processes and no per-item one-hot.  Windows
are integer µ-law codes sliced from a single concatenated array with
vectorized gathers; batches go to the device as ``[B, RF+WL]`` int32 (a few
hundred KB, vs the reference's ``[B, 256, 44093]`` float one-hot —
faster_audio_data.py:45-48) and the model embeds them on-chip
(:func:`music_tpu.ops.conv.token_causal_conv`).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Iterator

import numpy as np

from music_tpu.data import wavio


def mu_law_encode_np(audio: np.ndarray, quantization_channels: int = 256) -> np.ndarray:
    """Host-side µ-law encode — native C++ when built, numpy otherwise;
    same formula as the jitted op (music_tpu/ops/mulaw.py; reference
    wavenet/data/wav_to_numpy.py:7-23)."""
    from music_tpu import native

    return native.mulaw_encode(audio, quantization_channels)


def build_dataset(
    audio_dir: str | Path,
    out_dir: str | Path,
    *,
    suffix: str = ".wav",
    duration: int = 20,
    sample_rate: int = 16000,
    avg_amplitude: float = 0.05,
    silence_threshold: float | None = None,
) -> list[Path]:
    """Split every song under ``audio_dir`` into >=duration-second pieces,
    normalize, optionally trim silence, write numbered wavs
    (generate_audio_dataset.py:22-78 semantics)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    count = 0
    for song in sorted(Path(audio_dir).rglob(f"*{suffix}")):
        audio, sr = wavio.read_wav(song)
        audio = wavio.resample(audio, sr, sample_rate)
        audio = wavio.normalize_amplitude(audio, avg_amplitude)
        if silence_threshold is not None:
            audio = wavio.trim_silence(audio, silence_threshold)
        piece_len = duration * sample_rate
        for start in range(0, len(audio) - piece_len + 1, piece_len):
            piece = audio[start : start + piece_len]
            path = out_dir / f"piece_{count:05d}.wav"
            wavio.write_wav(path, piece, sample_rate)
            written.append(path)
            count += 1
    return written


def wavs_to_pickle(
    wav_dir: str | Path,
    out_path: str | Path,
    quantization_channels: int = 256,
) -> Path:
    """Encode all wavs to µ-law int arrays and pickle the list — the
    ``np_audio.pkl`` artifact (wav_to_numpy.py:25-37 format preserved)."""
    arrays = []
    for path in sorted(Path(wav_dir).glob("*.wav")):
        audio, _ = wavio.read_wav(path)
        arrays.append(mu_law_encode_np(audio, quantization_channels))
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with out_path.open("wb") as f:
        pickle.dump(arrays, f)
    return out_path


class AudioWindows:
    """Training windows over µ-law code sequences.

    Window layout is one ``[RF + WL]`` int array per example: positions
    ``[:-1]`` are the model input, ``[RF:]`` the targets — identical
    information to the reference's piece/target dicts
    (faster_audio_data.py:24-40: input ``[0, RF+WL-1)``, target
    ``[RF, RF+WL)``, stride WL).  Tail remainders shorter than a full window
    are dropped (the reference's tail path reuses a stale target — a bug we
    do not replicate; docs/DIVERGENCES.md #3).
    """

    def __init__(
        self,
        clips: list[np.ndarray],
        receptive_field: int,
        window_length: int,
    ):
        self.receptive_field = receptive_field
        self.window_length = window_length
        self.window = receptive_field + window_length
        starts = []
        offsets = []
        # concatenate clips; window starts never cross clip boundaries
        offset = 0
        chunks = []
        for clip in clips:
            clip = np.asarray(clip, np.int32)
            n = (len(clip) - self.receptive_field) // window_length
            for i in range(max(n, 0)):
                s = offset + i * window_length
                if s + self.window <= offset + len(clip):
                    starts.append(s)
            chunks.append(clip)
            offset += len(clip)
        self.data = np.concatenate(chunks) if chunks else np.zeros((0,), np.int32)
        self.starts = np.asarray(starts, np.int64)
        self.max_code = int(self.data.max(initial=0))

    def check_vocab(self, quantization_channels: int) -> None:
        """Fail loudly when the pickled codes exceed the model's µ-law
        range (e.g. a 256-level np_audio.pkl fed to a Q=64 model) — the
        silent alternative is out-of-range one-hots/labels and a NaN loss."""
        if self.max_code >= quantization_channels:
            raise ValueError(
                f"dataset contains code {self.max_code} but the model has "
                f"quantization_channels={quantization_channels}; re-encode "
                f"the dataset (wavs_to_pickle(..., quantization_channels="
                f"{quantization_channels}))"
            )

    @classmethod
    def from_pickle(cls, path: str | Path, receptive_field: int, window_length: int):
        with Path(path).open("rb") as f:
            clips = pickle.load(f)
        return cls([np.asarray(c) for c in clips], receptive_field, window_length)

    def __len__(self) -> int:
        return len(self.starts)

    def gather(self, idx: np.ndarray) -> np.ndarray:
        """Window gather ``[len(idx), RF+WL]`` int32 — native memcpy path
        when built, vectorized numpy otherwise."""
        from music_tpu import native

        return native.gather_windows(self.data, self.starts[idx], self.window)

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = True,
        epochs: int | None = 1,
    ) -> Iterator[np.ndarray]:
        """Yield ``[B, RF+WL]`` batches.  Replaces the multiprocess
        DataLoader (faster_audio_data.py:51-59) — slicing int windows is
        bandwidth-trivial, so a single-threaded vectorized gather outruns
        the original 8 worker processes building float one-hots."""
        rng = np.random.default_rng(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(self.starts)) if shuffle else np.arange(len(self.starts))
            end = len(order) - (len(order) % batch_size) if drop_remainder else len(order)
            for i in range(0, end, batch_size):
                yield self.gather(order[i : i + batch_size])
            epoch += 1
