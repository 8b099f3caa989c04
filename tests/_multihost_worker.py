"""Subprocess worker for the multi-host test: joins a 2-process CPU
jax.distributed cluster, runs ONE data-parallel WaveNet train step over the
global mesh with per-host batch rows, prints the loss.

Run: python tests/_multihost_worker.py <process_id> <num_processes> <port>
"""

import sys

import jax

# the sandbox sitecustomize pins the hardware platform; config wins
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)  # one chip per fake host


def main(pid: int, nproc: int, port: int) -> None:
    from music_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc, jax.devices()

    import numpy as np
    import optax

    from music_tpu.models import wavenet as wn
    from music_tpu.parallel.mesh import MeshSpec, make_mesh
    from music_tpu.train import wavenet_train as wt

    cfg = wn.WaveNetConfig(
        filter_width=2, dilations=(1, 2, 4, 8), dilation_channels=4,
        residual_channels=4, skip_channels=8, quantization_channels=32,
    )
    mesh = make_mesh(MeshSpec(data=-1))  # data axis spans BOTH hosts
    tx = optax.adam(1e-3)
    state = wt.init_state(jax.random.PRNGKey(0), cfg, tx, mesh)
    step_fn, _ = wt.make_train_step(cfg, tx, mesh, window_length=8)

    batch = np.random.default_rng(0).integers(
        0, 32, (4, cfg.receptive_field + 8)
    ).astype(np.int32)
    tokens = multihost.put_global_batch(mesh, batch)  # this host's rows only
    state, loss = step_fn(state, tokens)
    print(f"MHLOSS {float(loss):.8f}", flush=True)

    # SeqGAN dp across hosts: the trainer's _put_batch feeds per-host rows
    from music_tpu.models import seqgan as sg
    from music_tpu.train.seqgan_train import SeqGanConfig, SeqGanTrainer

    gcfg = sg.GeneratorConfig(vocab_size=30, emb_dim=8, hidden_dim=8, seq_len=8)
    dcfg = sg.DiscriminatorConfig(
        vocab_size=30, emb_dim=8, filter_sizes=(1, 2), num_filters=(8, 8), seq_len=8,
    )
    tr = SeqGanTrainer(
        SeqGanConfig(g=gcfg, d=dcfg, batch_size=4, generated_num=8, rollout_num=2),
        seed=0, mesh=mesh,
    )
    positive = tr.oracle_samples(8)
    mle = tr.pretrain_generator(positive, epochs=2)
    print(f"MHSEQGAN {mle:.8f}", flush=True)

    # checkpoint a HOST-SHARDED leaf: save() gathers collectively, writes
    # on process 0 only
    if len(sys.argv) > 4:
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from music_tpu.core import checkpoint as ckpt_lib

        m2 = Mesh(np.array(jax.devices()), ("model",))
        w = jnp.arange(16.0).reshape(8, 2)
        w_sharded = jax.device_put(w, NamedSharding(m2, P(None, "model")))
        assert not w_sharded.is_fully_addressable
        ckpt_lib.save(sys.argv[4], 3, {"w": w_sharded}, max_checkpoints=2)
        print("MHCKPT done", flush=True)

    # dp serving across hosts: each host transfers only its own prime
    # rows and receives only its own audio rows (zeros elsewhere)
    from music_tpu.generate.wavenet_generate import generate_batch

    primes = np.random.default_rng(7).integers(
        0, 32, (4, cfg.receptive_field + max(cfg.dilations))
    ).astype(np.int32)
    sp = wn.init_params(jax.random.PRNGKey(1), cfg)
    audio = generate_batch(
        cfg=cfg, params=sp, n=4, start_pieces=primes,
        duration=16 / 16000, mesh=mesh, sample_mode="argmax", seed=0,
    )
    assert audio.shape == (4, 16), audio.shape
    print("MHSERVE " + " ".join(f"{audio[i].sum():.8f}" for i in range(4)),
          flush=True)

    # multi-process DecodeSession: per-host admission into host-owned row
    # blocks; every host steps in lockstep (host 1's second stream joins a
    # call later, and host 0 finishes a stream mid-session)
    from music_tpu.generate.serving import DecodeSession

    sess_primes = np.random.default_rng(11).integers(
        0, 32, (4, cfg.receptive_field + max(cfg.dilations))
    ).astype(np.int32)
    sess = DecodeSession(
        cfg, sp, capacity=4, dtype=jax.numpy.float32, sample_mode="argmax",
        steps_per_call=16, backend="scan", mesh=mesh,
    )
    assert sess.capacity == 2, sess.capacity  # per-host admission bound
    mine = {}
    a = sess.add(sess_primes[2 * pid])
    out = sess.step()
    mine[2 * pid] = [out[a]]
    b = sess.add(sess_primes[2 * pid + 1]) if pid == 0 else None
    out = sess.step()
    mine[2 * pid].append(out[a])
    if pid == 0:
        mine[1] = [out[b]]
    else:
        b = sess.add(sess_primes[2 * pid + 1])
        sess.finish(a)
    out = sess.step()
    if pid == 0:
        mine[0].append(out[a])
        mine[1].append(out[b])
    else:
        mine[3] = [out[b]]
    # empty-host lockstep: host 1 finishes everything but must still
    # launch (silence rows) while host 0's streams keep decoding
    if pid == 1:
        sess.finish(b)
    out = sess.step()
    if pid == 0:
        mine[0].append(out[a])
        mine[1].append(out[b])
    else:
        assert out == {}, sorted(out)
    for i, chunks in sorted(mine.items()):
        toks = np.concatenate(chunks)
        print(f"MHSESSION {i} " + ",".join(str(int(t)) for t in toks),
              flush=True)

    # AE serving across hosts: encoding + prime rows per host in, this
    # host's reconstruction rows out (zeros elsewhere)
    from music_tpu.generate.wavenet_ae_generate import (
        generate_batch as ae_generate_batch,
    )
    from music_tpu.models import wavenet_ae as wae

    ae_cfg = wae.WaveNetAEConfig(
        filter_width=2, dilations=(1, 2, 4, 8), en_residual_channel=4,
        en_dilation_channel=4, de_residual_channel=4, de_dilation_channel=4,
        de_skip_channel=8, en_bottleneck_width=6, en_pool_kernel_size=4,
        quantization_channel=32,
    )
    ae_params = wae.init_params(jax.random.PRNGKey(9), ae_cfg)
    t_axis = np.arange(ae_cfg.receptive_field + 32) / 16000.0
    srcs = np.stack([
        0.4 * np.sin(2 * np.pi * (150.0 + 80.0 * i) * t_axis * 50)
        for i in range(2)
    ]).astype(np.float32)
    ae_audio = ae_generate_batch(
        cfg=ae_cfg, params=ae_params, source_audios=srcs,
        duration=16 / 16000, mesh=mesh,
    )
    assert ae_audio.shape == (2, 16), ae_audio.shape
    print("MHAESERVE " + " ".join(f"{ae_audio[i].sum():.8f}" for i in range(2)),
          flush=True)

    # multi-process AEDecodeSession: per-host encode + admission into
    # host-owned row blocks, lockstep steps with join/leave churn
    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.generate.serving import AEDecodeSession

    ae_t = np.arange(ae_cfg.receptive_field + max(ae_cfg.dilations) + 64) / 16000.0
    ae_clips = [
        mu_law_encode_np(
            0.4 * np.sin(2 * np.pi * (160.0 + 70.0 * i) * ae_t * 50), 32
        )
        for i in range(4)
    ]
    ae_sess = AEDecodeSession(
        ae_cfg, ae_params, capacity=4, steps_per_call=16, mesh=mesh,
    )
    assert ae_sess.capacity == 2, ae_sess.capacity  # per-host admission
    ae_mine = {}
    a = ae_sess.add(ae_clips[2 * pid])
    out = ae_sess.step()
    ae_mine[2 * pid] = [out[a]]
    b = ae_sess.add(ae_clips[2 * pid + 1]) if pid == 0 else None
    out = ae_sess.step()
    ae_mine[2 * pid].append(out[a])
    if pid == 0:
        ae_mine[1] = [out[b]]
    else:
        b = ae_sess.add(ae_clips[2 * pid + 1])
        ae_sess.finish(a)
    out = ae_sess.step()
    if pid == 0:
        ae_mine[0].append(out[a])
        ae_mine[1].append(out[b])
    else:
        ae_mine[3] = [out[b]]
    # empty-host lockstep: host 1 finishes everything but must still
    # launch (silence rows) while host 0's streams keep decoding
    if pid == 1:
        ae_sess.finish(b)
    out = ae_sess.step()
    if pid == 0:
        ae_mine[0].append(out[a])
        ae_mine[1].append(out[b])
    else:
        assert out == {}, sorted(out)
    for i, chunks in sorted(ae_mine.items()):
        toks = np.concatenate(chunks)
        print(f"MHAESESSION {i} " + ",".join(str(int(t)) for t in toks),
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
