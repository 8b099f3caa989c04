"""Multi-host distribution: the jax.distributed entry + per-host batch
sharding actually execute — a 2-process CPU cluster (gloo collectives)
runs one dp WaveNet train step and must reproduce the single-process loss
on the same global batch (SURVEY.md §2.6's DataParallel replacement)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import optax

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_loss() -> tuple[float, float]:
    """Same steps on a local 2-device data mesh (this process's virtual
    devices), same seeds — the ground truth the cluster must match."""
    from music_tpu.models import wavenet as wn
    from music_tpu.parallel.mesh import MeshSpec, make_mesh
    from music_tpu.train import wavenet_train as wt

    cfg = wn.WaveNetConfig(
        filter_width=2, dilations=(1, 2, 4, 8), dilation_channels=4,
        residual_channels=4, skip_channels=8, quantization_channels=32,
    )
    mesh = make_mesh(MeshSpec(data=2, seq=1, model=1), devices=jax.devices()[:2])
    tx = optax.adam(1e-3)
    state = wt.init_state(jax.random.PRNGKey(0), cfg, tx, mesh)
    step_fn, _ = wt.make_train_step(cfg, tx, mesh, window_length=8)
    batch = np.random.default_rng(0).integers(
        0, 32, (4, cfg.receptive_field + 8)
    ).astype(np.int32)
    from music_tpu.parallel import multihost

    state, loss = step_fn(state, multihost.put_global_batch(mesh, batch))

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
    return float(loss), float(mle)


def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    ckpt_dir = tmp_path / "mh_ckpt"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port), str(ckpt_dir)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses, mles = [], []
    for out in outs:
        wl = [ln for ln in out.splitlines() if ln.startswith("MHLOSS ")]
        gl = [ln for ln in out.splitlines() if ln.startswith("MHSEQGAN ")]
        assert wl and gl, out
        losses.append(float(wl[0].split()[1]))
        mles.append(float(gl[0].split()[1]))

    # both hosts see the same (replicated) global losses
    assert abs(losses[0] - losses[1]) < 1e-7, losses
    assert abs(mles[0] - mles[1]) < 1e-7, mles
    # and they equal the single-process results on the same global batches
    ref_loss, ref_mle = _single_process_loss()
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-5)
    np.testing.assert_allclose(mles[0], ref_mle, rtol=1e-5)

    # dp serving across hosts: each host's held rows must equal the
    # single-process decode of the same primes (argmax, deterministic);
    # unheld rows are zero CODES (which µ-law-decode to a constant) —
    # only the held rows carry real audio
    from music_tpu.generate.wavenet_generate import generate_batch
    from music_tpu.models import wavenet as wn

    cfg = wn.WaveNetConfig(
        filter_width=2, dilations=(1, 2, 4, 8), dilation_channels=4,
        residual_channels=4, skip_channels=8, quantization_channels=32,
    )
    primes = np.random.default_rng(7).integers(
        0, 32, (4, cfg.receptive_field + max(cfg.dilations))
    ).astype(np.int32)
    sp = wn.init_params(jax.random.PRNGKey(1), cfg)
    ref = generate_batch(
        cfg=cfg, params=sp, n=4, start_pieces=primes,
        duration=16 / 16000, sample_mode="argmax", seed=0,
    )
    ref_sums = [float(ref[i].sum()) for i in range(4)]
    for pid, out in enumerate(outs):
        sl = [ln for ln in out.splitlines() if ln.startswith("MHSERVE ")]
        assert sl, out
        sums = [float(x) for x in sl[0].split()[1:]]
        held = range(0, 2) if pid == 0 else range(2, 4)
        for i in held:
            np.testing.assert_allclose(sums[i], ref_sums[i], atol=1e-5)

    # the host-sharded checkpoint was gathered and written (process 0 only)
    assert all("MHCKPT done" in out for out in outs)
    from music_tpu.core import checkpoint as ckpt_lib

    state = ckpt_lib.restore(ckpt_dir, {"w": np.zeros((8, 2), np.float32)})
    np.testing.assert_array_equal(
        state["w"], np.arange(16.0, dtype=np.float32).reshape(8, 2)
    )


    # multi-process DecodeSession: every stream's tokens (per-host
    # admission, join/leave churn across lockstep steps) must equal the
    # single-process session's on the same primes (VERDICT r3 #4)
    from music_tpu.generate.serving import DecodeSession
    import jax.numpy as jnp

    sess_primes = np.random.default_rng(11).integers(
        0, 32, (4, cfg.receptive_field + max(cfg.dilations))
    ).astype(np.int32)
    ref_sess = DecodeSession(
        cfg, sp, capacity=4, dtype=jnp.float32, sample_mode="argmax",
        steps_per_call=16, backend="scan",
    )
    want = {}
    a0 = ref_sess.add(sess_primes[0]); a1 = ref_sess.add(sess_primes[2])
    out = ref_sess.step()
    want[0] = [out[a0]]; want[2] = [out[a1]]
    b0 = ref_sess.add(sess_primes[1])
    out = ref_sess.step()
    want[0].append(out[a0]); want[2].append(out[a1]); want[1] = [out[b0]]
    b1 = ref_sess.add(sess_primes[3]); ref_sess.finish(a1)
    out = ref_sess.step()
    want[0].append(out[a0]); want[1].append(out[b0]); want[3] = [out[b1]]
    # 4th lockstep step: host 1's row block is empty in the cluster run
    ref_sess.finish(b1)
    out = ref_sess.step()
    want[0].append(out[a0]); want[1].append(out[b0])

    got = {}
    for out_text in outs:
        for ln in out_text.splitlines():
            if ln.startswith("MHSESSION "):
                _, idx, toks = ln.split(" ", 2)
                got[int(idx)] = np.array([int(t) for t in toks.split(",")])
    assert sorted(got) == [0, 1, 2, 3], sorted(got)
    for i in range(4):
        np.testing.assert_array_equal(
            got[i], np.concatenate(want[i]), err_msg=f"stream {i}"
        )


    # AE serving across hosts: each host's held reconstruction rows must
    # equal the single-process batch on the same sources
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
    ae_ref = ae_generate_batch(
        cfg=ae_cfg, params=ae_params, source_audios=srcs,
        duration=16 / 16000,
    )
    for pid, out in enumerate(outs):
        ln = [l for l in out.splitlines() if l.startswith("MHAESERVE ")]
        assert ln, out
        sums = [float(x) for x in ln[0].split()[1:]]
        np.testing.assert_allclose(sums[pid], float(ae_ref[pid].sum()), atol=1e-5)

    # multi-process AEDecodeSession: every reconstruction stream's tokens
    # (per-host encode + admission, join/leave churn across lockstep
    # steps) must equal the single-process session's on the same clips
    from music_tpu.data.audio import mu_law_encode_np
    from music_tpu.generate.serving import AEDecodeSession

    ae_t = np.arange(ae_cfg.receptive_field + max(ae_cfg.dilations) + 64) / 16000.0
    ae_clips = [
        mu_law_encode_np(
            0.4 * np.sin(2 * np.pi * (160.0 + 70.0 * i) * ae_t * 50), 32
        )
        for i in range(4)
    ]
    ae_ref_sess = AEDecodeSession(
        ae_cfg, ae_params, capacity=4, steps_per_call=16,
    )
    ae_want = {}
    a0 = ae_ref_sess.add(ae_clips[0]); a1 = ae_ref_sess.add(ae_clips[2])
    out = ae_ref_sess.step()
    ae_want[0] = [out[a0]]; ae_want[2] = [out[a1]]
    b0 = ae_ref_sess.add(ae_clips[1])
    out = ae_ref_sess.step()
    ae_want[0].append(out[a0]); ae_want[2].append(out[a1]); ae_want[1] = [out[b0]]
    b1 = ae_ref_sess.add(ae_clips[3]); ae_ref_sess.finish(a1)
    out = ae_ref_sess.step()
    ae_want[0].append(out[a0]); ae_want[1].append(out[b0]); ae_want[3] = [out[b1]]
    # 4th lockstep step: host 1's row block is empty in the cluster run
    # (silence rows) while host 0's streams keep decoding
    ae_ref_sess.finish(b1)
    out = ae_ref_sess.step()
    ae_want[0].append(out[a0]); ae_want[1].append(out[b0])

    ae_got = {}
    for out_text in outs:
        for ln in out_text.splitlines():
            if ln.startswith("MHAESESSION "):
                _, idx, toks = ln.split(" ", 2)
                ae_got[int(idx)] = np.array([int(t) for t in toks.split(",")])
    assert sorted(ae_got) == [0, 1, 2, 3], sorted(ae_got)
    for i in range(4):
        np.testing.assert_array_equal(
            ae_got[i], np.concatenate(ae_want[i]), err_msg=f"ae stream {i}"
        )
