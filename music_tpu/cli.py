"""Unified command-line interface.

The reference has no CLI (every subproject is run as a bare script with
hardcoded JSON paths — SURVEY.md §6); this is the framework's public
command surface over the same JSON-params convention:

    python -m music_tpu wavenet train        [--params-dir DIR]
    python -m music_tpu wavenet generate     --checkpoint DIR --out out.wav
    python -m music_tpu wavenet-ae train     [--params-dir DIR]
    python -m music_tpu seqgan train         [--params-dir DIR]
    python -m music_tpu leakgan train        [--params-dir DIR]
    python -m music_tpu crnngan train        --midi-dir DIR
    python -m music_tpu crnngan generate     --checkpoint DIR --out out.mid
    python -m music_tpu dataset build-audio  --audio-dir D --out-dir D2
    python -m music_tpu vis loss             --log FILE --out loss.png

Default params dirs ship under ``music_tpu/params/<workload>/`` (the
reference's schemas, repaired — music_tpu.core.config handles its malformed
JSON dialect too).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

PARAMS_ROOT = Path(__file__).parent / "params"


def _load_params(params_dir: Path) -> dict:
    from music_tpu.core.config import load_params_dir

    return load_params_dir(params_dir)


def cmd_wavenet(args):
    if args.action == "train":
        from music_tpu.train.wavenet_train import train

        p = _load_params(Path(args.params_dir or PARAMS_ROOT / "wavenet"))
        tp = dict(p["train_params"])
        if args.coordinator:  # multi-host entry (SURVEY.md §2.6)
            tp.update(
                coordinator=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        train(
            wavenet_params=p["wavenet_params"],
            dataset_params=p["dataset_params"],
            train_params=tp,
        )
    else:
        from music_tpu.generate.wavenet_generate import generate, generate_batch
        from music_tpu.models.wavenet import WaveNetConfig

        p = _load_params(Path(args.params_dir or PARAMS_ROOT / "wavenet"))
        cfg = WaveNetConfig.from_json(p["wavenet_params"])
        if getattr(args, "num", 1) > 1:
            # serving path: N streams packed into as few kernels as fit
            out = Path(args.out)
            out_dir = out.parent / out.stem if out.suffix == ".wav" else out
            generate_batch(
                cfg=cfg,
                checkpoint_dir=args.checkpoint,
                n=args.num,
                out_dir=out_dir,
                duration=args.duration,
                sample_mode=args.sample_mode,
            )
            print(f"wrote {args.num} wavs to {out_dir}/")
        else:
            generate(
                cfg=cfg,
                checkpoint_dir=args.checkpoint,
                out_path=args.out,
                duration=args.duration,
                sample_mode=args.sample_mode,
            )
            print(f"wrote {args.out}")


def cmd_wavenet_ae(args):
    p = _load_params(Path(args.params_dir or PARAMS_ROOT / "wavenet_autoencoder"))
    if args.action == "train":
        from music_tpu.train.wavenet_ae_train import train

        train(
            model_params=p["model_params"],
            dataset_params=p["dataset_params"],
            train_params=p["train_params"],
        )
    else:
        from music_tpu.generate.wavenet_ae_generate import generate
        from music_tpu.models.wavenet_ae import WaveNetAEConfig

        cfg = WaveNetAEConfig.from_json(p["model_params"])
        src = Path(args.source)
        if src.is_dir():
            # serving path: reconstruct every wav in the directory through
            # as few fused-kernel launches as fit (equal-length rows —
            # trim to the shortest clip so conditioning frames align)
            import numpy as np

            from music_tpu.data import wavio
            from music_tpu.generate.wavenet_ae_generate import generate_batch

            paths = sorted(src.glob("*.wav"))
            if not paths:
                raise SystemExit(f"no .wav files in {src}")
            rows = []
            for wav in paths:
                audio, src_sr = wavio.read_wav(wav)
                rows.append(wavio.resample(audio, src_sr, 16000))
            t_min = min(len(r) for r in rows)
            out = Path(args.out)
            out_dir = out.parent / out.stem if out.suffix == ".wav" else out
            generate_batch(
                cfg=cfg, checkpoint_dir=args.checkpoint,
                source_audios=np.stack([r[:t_min] for r in rows]),
                out_dir=out_dir, duration=args.duration,
            )
            print(f"wrote {len(paths)} wavs to {out_dir}/")
        else:
            generate(
                cfg=cfg, checkpoint_dir=args.checkpoint,
                source_path=args.source, out_path=args.out,
                duration=args.duration,
            )
            print(f"wrote {args.out}")


def cmd_seqgan(args):
    import numpy as np

    from music_tpu.models.seqgan import DiscriminatorConfig, GeneratorConfig
    from music_tpu.train.seqgan_train import SeqGanConfig, SeqGanTrainer, write_samples

    p = _load_params(Path(args.params_dir or PARAMS_ROOT / "seqgan"))["params"]
    g = GeneratorConfig(
        vocab_size=p["vocab_size"], emb_dim=p["emb_dim"],
        hidden_dim=p["hidden_dim"], seq_len=p["seq_len"],
        start_token=p["start_token"],
    )
    cfg = SeqGanConfig(
        g=g, d=DiscriminatorConfig(vocab_size=p["vocab_size"], seq_len=p["seq_len"]),
        batch_size=p["batch_size"], generated_num=p["generated_num"],
        rollout_num=p["rollout_num"], g_lr=p["g_lr"], d_lr=p["d_lr"],
    )
    tr = SeqGanTrainer(cfg)
    positive = tr.oracle_samples(cfg.generated_num)
    write_samples("data/seqgan/positive.txt", positive)
    print("pretrain G:", tr.pretrain_generator(positive, epochs=p["pretrain_g_epochs"]))
    print("pretrain D:", tr.train_discriminator(positive, 1, 1))
    for r in range(p["adversarial_rounds"]):
        g_loss, d_loss = tr.adversarial_epoch(positive)
        print(f"round {r}: g_loss={g_loss:.4f} d_loss={d_loss:.4f} "
              f"oracle_nll={tr.oracle_nll():.4f}")
    write_samples("data/seqgan/generated.txt", tr.generator_samples(cfg.generated_num))


def cmd_leakgan(args):
    import numpy as np

    from music_tpu.models.leakgan import LeakGanConfig
    from music_tpu.train.leakgan_train import LeakGanTrainConfig, LeakGanTrainer

    pd = Path(args.params_dir or PARAMS_ROOT / "leak_gan")
    p = _load_params(pd)
    cfg = LeakGanConfig.from_json(p["leak_gan_params"])
    tp = p["train_params"]
    if args.corpus:
        real = np.load(args.corpus)
    else:
        from music_tpu.data.tokens import load_corpus

        real, _ = load_corpus(args.data_dir)
    if int(real.max()) >= cfg.vocab_size:
        # the reference's own corpus holds 1-based ids up to 5258 while its
        # params say vocab_size 5258 — its Worker embedding would index out
        # of range on its own data.  Grow the vocab to cover the corpus
        # (id 0 stays the start/pad token; docs/DIVERGENCES.md #18).
        import dataclasses

        cfg = dataclasses.replace(cfg, vocab_size=int(real.max()) + 1)
        print(f"corpus max id {int(real.max())} >= configured vocab; "
              f"using vocab_size={cfg.vocab_size}")
    tc = LeakGanTrainConfig(
        cfg=cfg, batch_size=tp["batch_size"], m_lr=tp["m_lr"], w_lr=tp["w_lr"],
        d_lr=tp["d_lr"], decay_step_size=tp["decay_step_size"],
        decay_rate=tp["decay_rate"], rollout_num=tp["rollout_num"],
        generated_num=tp["generated_num"],
    )
    tr = LeakGanTrainer(tc, seed=tp.get("seed", 0))
    if args.checkpoint:
        start = tr.restore(args.checkpoint)
        print(f"resumed from step {start}")
    print("pretrain D:", tr.pretrain_discriminator(real, epochs=args.pretrain_d_epochs))
    print("pretrain G:", tr.pretrain_generator(real, epochs=args.pretrain_g_epochs))
    for epoch in range(args.adversarial_epochs):
        ml, wl, dl = tr.adversarial_epoch(real)
        print(f"epoch {epoch}: manager={ml:.4f} worker={wl:.4f} d={dl:.4f}")
    if args.checkpoint:
        tr.save(args.checkpoint, args.adversarial_epochs)


def cmd_crnngan(args):
    import numpy as np

    from music_tpu.models.crnngan import CRnnGanConfig
    from music_tpu.train.crnngan_train import (
        CRnnGanTrainConfig, CRnnGanTrainer, FeatureScaler,
    )

    p = _load_params(Path(args.params_dir or PARAMS_ROOT / "c_rnn_gan"))
    cfg = CRnnGanConfig.from_json(p["crnngan_params"])
    if args.action == "train":
        import dataclasses

        from music_tpu.data.midi import build_meta_onehots, load_midi_dataset

        data, metas = load_midi_dataset(
            args.midi_dir or p["dataset_params"]["root_dir"],
            song_length=cfg.song_length,
        )
        if len(data) == 0:
            sys.exit("no MIDI files found")
        # per-song genre/composer one-hot conditioning (data.py:151-157)
        meta, genres, composers = build_meta_onehots(metas)
        cfg = dataclasses.replace(cfg, meta_dim=meta.shape[1])
        print(f"conditioning on {len(genres)} genres + {len(composers)} composers")
        scaler = FeatureScaler(data)
        normed = scaler.transform(data).astype(np.float32)
        tr = CRnnGanTrainer(CRnnGanTrainConfig(cfg=cfg, batch_size=p["dataset_params"]["batch_size"]))
        print("pretrain:", tr.pretrain(normed, epochs=p["train_params"]["pretrain_epochs"], meta=meta))
        for epoch in range(p["train_params"]["num_epochs"]):
            gl, dl, acc = tr.gan_epoch(normed, meta=meta)
            print(f"epoch {epoch}: g={gl:.4f} d={dl:.4f} d_acc={acc:.2f}")
        if args.checkpoint:
            tr.save(args.checkpoint, p["train_params"]["num_epochs"])
    else:
        from music_tpu.generate.crnngan_generate import generate
        from music_tpu.core import checkpoint as ckpt_lib
        from music_tpu.models import crnngan as cg
        import dataclasses
        import jax

        # infer the conditioning width from the trained fc1 shape
        shapes = ckpt_lib.leaf_shapes(args.checkpoint, prefix="['g_params']")
        in_dim = shapes["['fc1']['w']"][0]
        meta_dim = in_dim - cfg.noise_dim - cfg.num_song_features
        cfg = dataclasses.replace(cfg, meta_dim=max(int(meta_dim), 0))
        example = cg.init_generator(jax.random.PRNGKey(0), cfg)
        params = ckpt_lib.restore_subtree(args.checkpoint, example, prefix="['g_params']")
        generate(params, cfg, args.out)
        print(f"wrote {args.out}")


def cmd_dataset(args):
    if args.action == "scrape-midi":
        import json

        from music_tpu.data.midi_scraper import (
            DEFAULT_SOURCES, download, write_split_lists,
        )

        cfg = json.loads(Path(args.sources or DEFAULT_SOURCES).read_text())
        sources = cfg.get("sources", cfg)
        written = download(
            args.out_dir, sources,
            max_files_per_source=args.max_per_source,
        )
        sp = cfg.get("splits", {})
        splits = write_split_lists(
            args.out_dir,
            validation_fraction=sp.get("validation_fraction", 0.2),
            test_fraction=sp.get("test_fraction", 0.1),
            seed=sp.get("seed", 0),
        )
        print(
            f"{len(written)} new files; splits: "
            + ", ".join(f"{k}={len(v)}" for k, v in splits.items())
        )
        return

    from music_tpu.data.audio import build_dataset, wavs_to_pickle

    if not args.audio_dir:
        sys.exit("build-audio requires --audio-dir")
    pieces = build_dataset(
        args.audio_dir, args.out_dir,
        duration=args.duration, sample_rate=args.sample_rate,
    )
    pkl = wavs_to_pickle(args.out_dir, Path(args.out_dir) / "np_audio.pkl")
    print(f"{len(pieces)} pieces -> {pkl}")


def cmd_vis(args):
    from music_tpu.utils.visualize import plot_loss

    out = plot_loss(args.log, args.out)
    print(f"wrote {out}")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="music_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("wavenet")
    p.add_argument("action", choices=["train", "generate"])
    p.add_argument("--params-dir")
    p.add_argument("--checkpoint")
    p.add_argument("--out", default="generated.wav")
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--sample-mode", default="argmax")
    p.add_argument(
        "--num", type=int, default=1,
        help="serve N independent streams (writes N wavs under --out's stem)",
    )
    p.add_argument("--coordinator", help="multi-host: coordinator host:port")
    p.add_argument("--num-processes", type=int, help="multi-host: world size")
    p.add_argument("--process-id", type=int, help="multi-host: this process's rank")
    p.set_defaults(fn=cmd_wavenet)

    p = sub.add_parser("wavenet-ae")
    p.add_argument("action", choices=["train", "generate"])
    p.add_argument("--params-dir")
    p.add_argument("--checkpoint")
    p.add_argument(
        "--source",
        help="source wav to reconstruct, or a directory of wavs to serve "
        "concurrently (writes one reconstruction per clip under --out's stem)",
    )
    p.add_argument("--out", default="reconstructed.wav")
    p.add_argument("--duration", type=float, default=None)
    p.set_defaults(fn=cmd_wavenet_ae)

    p = sub.add_parser("seqgan")
    p.add_argument("action", choices=["train"])
    p.add_argument("--params-dir")
    p.set_defaults(fn=cmd_seqgan)

    p = sub.add_parser("leakgan")
    p.add_argument("action", choices=["train"])
    p.add_argument("--params-dir")
    p.add_argument("--corpus", help="path to corpus.npy")
    p.add_argument("--data-dir", default="data/leak_gan")
    p.add_argument("--checkpoint")
    p.add_argument("--pretrain-g-epochs", type=int, default=1)
    p.add_argument("--pretrain-d-epochs", type=int, default=1)
    p.add_argument("--adversarial-epochs", type=int, default=1)
    p.set_defaults(fn=cmd_leakgan)

    p = sub.add_parser("crnngan")
    p.add_argument("action", choices=["train", "generate"])
    p.add_argument("--params-dir")
    p.add_argument("--midi-dir")
    p.add_argument("--checkpoint")
    p.add_argument("--out", default="generated.mid")
    p.set_defaults(fn=cmd_crnngan)

    p = sub.add_parser("dataset")
    p.add_argument("action", choices=["build-audio", "scrape-midi"])
    p.add_argument("--audio-dir")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--duration", type=int, default=20)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--sources", help="scrape-midi: sources JSON (default: shipped table)")
    p.add_argument("--max-per-source", type=int, help="scrape-midi: cap per composer")
    p.set_defaults(fn=cmd_dataset)

    p = sub.add_parser("vis")
    p.add_argument("action", choices=["loss"])
    p.add_argument("--log", required=True)
    p.add_argument("--out", default="loss.png")
    p.set_defaults(fn=cmd_vis)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
