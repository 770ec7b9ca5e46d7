"""2-process jax.distributed integration tests (coordinator on localhost).

Validates the multi-host story end-to-end on CPU (VERDICT r1 item 1):
  - init_multihost() picks up the coordinator env and initializes
    jax.distributed from inside the real CLI mains;
  - a 2-process train step matches the single-process result at fixed
    data-axis size (Gloo cross-process collectives == in-process);
  - the real cli.train runs on a 2-process mesh and only process 0 writes
    checkpoints/config/logs;
  - sharded cli.extract produces disjoint, complete, correct shards.

Reference equivalents: torchrun + dist.init_process_group
(speakerlab/bin/train.py:34), rank::world file sharding (bin/extract.py:67).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(task_args, nproc=2, timeout=600):
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in workers
        env.update({
            "JAX_PLATFORMS": "cpu",
            "SPEAKER3D_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "SPEAKER3D_NUM_PROCESSES": str(nproc),
            "SPEAKER3D_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER] + task_args, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return outs


def _launch_procs(task_args, outdir, nproc=2):
    """Start workers with file-backed stdout (so the test can watch
    progress and signal mid-epoch) and return the Popen list + log paths."""
    port = _free_port()
    procs, logs = [], []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "SPEAKER3D_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "SPEAKER3D_NUM_PROCESSES": str(nproc),
            "SPEAKER3D_PROCESS_ID": str(pid),
        })
        log = os.path.join(outdir, f"rank{pid}.log")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER] + task_args, env=env, cwd=REPO,
            stdout=open(log, "w"), stderr=subprocess.STDOUT, text=True))
    return procs, logs


def _wait_for_marker(path, marker, timeout=300):
    import time

    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(path):
            with open(path) as f:
                if marker in f.read():
                    return True
        import time as _t
        _t.sleep(0.05)
    return False


def _make_corpus(root, n_spk=3, n_utt=6, dur=1.0, seed=0, fs=16000):
    from speaker3d_tpu.utils.fileio import write_wav

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    rows = []
    freqs = [200, 800, 2600]
    for s in range(n_spk):
        for u in range(n_utt):
            t = np.arange(int(dur * fs)) / fs
            f = freqs[s] * (1 + 0.02 * rng.standard_normal())
            wav = (0.3 * np.sin(2 * np.pi * f * t)
                   + 0.1 * np.sin(2 * np.pi * 2 * f * t)
                   + 0.01 * rng.standard_normal(len(t)))
            path = os.path.join(root, "wav", f"spk{s}_utt{u}.wav")
            write_wav(path, wav.astype(np.float32), fs)
            rows.append((f"spk{s}_utt{u}", path, f"spk{s}"))
    csv_path = os.path.join(root, "train.csv")
    with open(csv_path, "w") as f:
        f.write("ID,wav,spk\n")
        for rid, path, spk in rows:
            f.write(f"{rid},{path},{spk}\n")
    return csv_path, rows


def test_two_process_step_matches_single_process(tmp_path):
    """Gloo cross-process psum/pmean must reproduce the in-process result."""
    out = os.path.join(str(tmp_path), "two_proc.npz")
    _launch(["step_equiv", out])
    got = np.load(out)

    # single-process reference on 2 local devices (same data-axis size)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speaker3d_tpu.parallel.mesh import make_mesh
    from speaker3d_tpu.train.sv_train import (
        init_sv_train_state,
        make_sv_train_step,
    )
    import flax.linen as nn

    def tiny_batch(seed=0, b=8, t=12, f=20, num_classes=10):
        # must mirror tests/multihost_worker.py::tiny_batch exactly
        rng = np.random.default_rng(seed)
        labels = rng.integers(0, num_classes, b)
        feats = rng.standard_normal((b, t, f)).astype(np.float32) * 0.1
        for i, lab in enumerate(labels):
            feats[i, :, lab] += 2.0
        return {"feats": feats, "labels": labels.astype(np.int32)}

    class TinyModel(nn.Module):
        emb: int = 16

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Dense(32)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            return nn.Dense(self.emb)(x.mean(axis=1))

    from speaker3d_tpu.train.sv_train import SVTrainConfig

    cfg = SVTrainConfig(num_classes=10, embedding_size=16, max_lr=0.05,
                        min_lr=1e-3, warmup_epoch=1, fix_epoch=10,
                        step_per_epoch=10, increase_start_epoch=2,
                        margin_fix_epoch=5, final_margin=0.2)
    model = TinyModel()
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    sharding = NamedSharding(mesh, P("data"))
    state = init_sv_train_state(jax.random.PRNGKey(0), model,
                                tiny_batch(0)["feats"][:1], cfg, mesh)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_sv_train_step(model, cfg, mesh, host)
    losses = []
    for i in range(3):
        batch = jax.device_put(tiny_batch(seed=i), sharding)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    final = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    flat = np.concatenate([np.ravel(v) for v in sorted(
        jax.tree_util.tree_leaves(final["params"]), key=lambda a: a.size)])

    np.testing.assert_allclose(got["losses"], losses, atol=1e-6)
    np.testing.assert_allclose(got["params"], flat, atol=1e-5)
    np.testing.assert_allclose(got["cls_w"], final["cls_w"], atol=1e-5)


def test_two_process_train_and_extract_cli(tmp_path):
    """The real cli.train + cli.extract on a 2-process pod: rank-0-only
    writes, disjoint complete extraction shards, values matching a
    single-process extraction."""
    root = str(tmp_path)
    csv_path, rows = _make_corpus(root)
    exp_dir = os.path.join(root, "exp")
    config = {
        "exp_dir": exp_dir,
        "data": csv_path,
        "sample_rate": 16000,
        "n_mels": 80,
        "wav_len": 0.6,
        "speed_pertub": False,
        "aug_prob": 0.0,
        "batch_size": 8,          # GLOBAL batch: 4 per process
        "num_workers": 2,
        "num_epoch": 1,
        "model_parallel": 1,
        "embedding_size": 32,
        "max_lr": 0.05,
        "min_lr": 0.001,
        "warmup_epoch": 1,
        "log_batch_freq": 1,
        "model": {
            "obj": "speaker3d_tpu.models.eres2netv2.ERes2NetV2",
            "args": {"feat_dim": 80, "embedding_size": 32,
                     "m_channels": 8, "num_blocks": [1, 1, 1, 1]},
        },
    }
    cfg_path = os.path.join(root, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    _launch(["train_cli", cfg_path])

    # rank-0-only writes: exactly one checkpoint tree, one config snapshot
    ckpts = sorted(os.listdir(os.path.join(exp_dir, "models")))
    assert ckpts == ["CKPT-EPOCH-1-00"], ckpts
    assert os.path.isfile(os.path.join(exp_dir, "config.yaml"))
    assert os.path.isfile(os.path.join(exp_dir, "train_epoch.log"))
    with open(os.path.join(exp_dir, "train_epoch.log")) as f:
        lines = [ln for ln in f if ln.strip()]
    assert len(lines) == 1, lines  # one epoch logged once, not twice

    # sharded extraction across the 2-process pod
    scp = os.path.join(root, "wav.scp")
    with open(scp, "w") as f:
        for rid, path, _ in rows:
            f.write(f"{rid} {path}\n")
    emb_dir = os.path.join(exp_dir, "embeddings")
    _launch(["extract_cli", "--exp_dir", exp_dir, "--data", scp,
             "--out_dir", emb_dir, "--mode", "chunked",
             "--batch_size", "4"])

    shard0 = np.load(os.path.join(emb_dir, "embeddings_0.npz"))
    shard1 = np.load(os.path.join(emb_dir, "embeddings_1.npz"))
    k0, k1 = set(shard0.files), set(shard1.files)
    assert k0 and k1 and not (k0 & k1), "shards must be disjoint"
    assert k0 | k1 == {r[0] for r in rows}, "shards must cover all utts"

    # values must match a single-process extraction of the same checkpoint
    from speaker3d_tpu.cli.extract import main as extract_main

    ref_dir = os.path.join(exp_dir, "embeddings_1proc")
    extract_main(["--exp_dir", exp_dir, "--data", scp, "--out_dir", ref_dir,
                  "--mode", "chunked", "--batch_size", "4"])
    ref = np.load(os.path.join(ref_dir, "embeddings_0.npz"))
    for key in ref.files:
        shard = shard0 if key in k0 else shard1
        np.testing.assert_allclose(shard[key], ref[key], atol=2e-4,
                                   err_msg=key)


def _kill_resume_config(root, csv_path, num_epoch=100):
    # num_epoch is headroom, not workload: the run is killed around epoch
    # 3 and the resume finishes the rest; 100 tiny epochs keep the
    # interrupt window wide even on a fast warm-cache machine (collective
    # preemption detection lags the signal by up to poll_interval steps)
    exp_dir = os.path.join(root, "exp_kr")
    config = {
        "exp_dir": exp_dir, "data": csv_path, "sample_rate": 16000,
        "n_mels": 80, "wav_len": 0.6, "speed_pertub": False,
        "aug_prob": 0.0, "batch_size": 8, "num_workers": 2,
        "num_epoch": num_epoch, "model_parallel": 1, "embedding_size": 32,
        "max_lr": 0.05, "min_lr": 0.001, "warmup_epoch": 2,
        "log_batch_freq": 1,
        "model": {"obj": "speaker3d_tpu.models.eres2netv2.ERes2NetV2",
                  "args": {"feat_dim": 80, "embedding_size": 32,
                           "m_channels": 8, "num_blocks": [1, 1, 1, 1]}},
    }
    cfg_path = os.path.join(root, "cfg_kr.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    return exp_dir, cfg_path, config


def _log_epochs(exp_dir):
    path = os.path.join(exp_dir, "train_epoch.log")
    if not os.path.exists(path):
        return [], []
    epochs, losses = [], []
    with open(path) as f:
        for ln in f:
            if "epoch:" in ln:
                fields = dict(p.strip().split(": ") for p in ln.split(" - "))
                epochs.append(int(fields["epoch"]))
                losses.append(float(fields["avg_loss"]))
    return epochs, losses


def _run_kill_resume(tmp_path, kill_ranks):
    """SIGTERM `kill_ranks` of a live 2-process cli.train pod mid-run, then
    restart the pod and require a clean resume (VERDICT r4 item 4).

    Pins: (a) every rank exits 0 after the signal — including the rank that
    did NOT receive it (the pod-aware poll() latch, not a hang in a
    collective against a dead peer); (b) rank 0 writes a loadable
    preemption checkpoint; (c) the restarted pod replays the interrupted
    epoch and completes the schedule with a contiguous epoch log and a
    decreasing loss. Reference operational story: torchrun restart,
    speakerlab/bin/train.py:82-116."""
    import signal as _signal
    import time

    root = str(tmp_path)
    csv_path, _rows = _make_corpus(root)
    exp_dir, cfg_path, config = _kill_resume_config(root, csv_path)

    procs, logs = _launch_procs(["train_cli", cfg_path], root)
    try:
        assert _wait_for_marker(logs[0], "epoch 3 "), (
            "rank0 never reached epoch 3:\n" + open(logs[0]).read()[-2000:])
        for r in kill_ranks:
            procs[r].send_signal(_signal.SIGTERM)
        for p in procs:
            assert p.wait(timeout=300) == 0, (
                "\n".join(open(log).read()[-2000:] for log in logs))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    rank0_log = open(logs[0]).read()
    if 0 not in kill_ranks:
        # the unsignalled rank must have joined via the collective latch
        assert "peer rank requested shutdown" in rank0_log, rank0_log[-2000:]
    assert "[preemption] checkpoint saved" in rank0_log, rank0_log[-2000:]

    # the first run must have been interrupted, not completed
    epochs1, _ = _log_epochs(exp_dir)
    assert epochs1 and max(epochs1) < config["num_epoch"], epochs1

    # preemption checkpoint is loadable and rank-0-only (no rank suffix
    # collisions: exactly one tree per epoch label)
    from speaker3d_tpu.utils.checkpoint import Checkpointer, EpochCounter

    counter = EpochCounter(config["num_epoch"])
    ckpt = Checkpointer(os.path.join(exp_dir, "models"),
                        recoverables={"epoch_counter": counter})
    recovered = ckpt.recover_if_possible()
    assert recovered is not None and "train_state" in recovered
    assert recovered["__meta__"]["epoch"] >= 1

    # restart the pod: it must resume and complete the whole schedule
    procs, logs2 = _launch_procs(["train_cli", cfg_path], root)
    try:
        for p in procs:
            assert p.wait(timeout=600) == 0, (
                "\n".join(open(log).read()[-2000:] for log in logs2))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert "recovered from epoch" in open(logs2[0]).read()

    epochs2, losses2 = _log_epochs(exp_dir)
    assert epochs2 == list(range(1, config["num_epoch"] + 1)), (
        "epoch log not contiguous across kill+resume", epochs2)
    assert losses2[-1] < losses2[0], losses2
    final = max(os.listdir(os.path.join(exp_dir, "models")),
                key=lambda d: int(d.split("-")[2]))
    assert final == f"CKPT-EPOCH-{config['num_epoch']}-00", final


def test_two_process_kill_one_rank_resume(tmp_path):
    _run_kill_resume(tmp_path, kill_ranks=[1])


def test_two_process_kill_both_ranks_resume(tmp_path):
    _run_kill_resume(tmp_path, kill_ranks=[0, 1])


def test_two_process_ssl_step_matches_single_process(tmp_path):
    """SSL (RDINO) training over 2 coordinator-connected processes: SyncBN,
    DINO centering, and the VICReg all_gather cross Gloo and must equal the
    in-process 2-device result on the same global batch."""
    out = os.path.join(str(tmp_path), "ssl_two_proc.npz")
    _launch(["ssl_equiv", out])
    got = np.load(out)

    import flax.linen as nn
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speaker3d_tpu.models.common import batch_norm
    from speaker3d_tpu.models.ssl_heads import RDINOCombiner, RDINOHead
    from speaker3d_tpu.parallel.mesh import make_mesh
    from speaker3d_tpu.train.ssl_train import (
        SSLTrainConfig,
        init_ssl_state,
        make_rdino_train_step,
    )

    class TinyBackbone(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(16)(x)
            x = batch_norm(train, name="bn")(x)
            x = nn.relu(x)
            return x.mean(axis=1)

    cfg = SSLTrainConfig(out_dim=32, ncrops=4, step_per_epoch=2, epochs=3,
                         warmup_epochs=1, base_lr=0.02, freeze_last_layer=1)
    model = RDINOCombiner(
        backbone=TinyBackbone(),
        head=RDINOHead(out_dim=32, hidden_dim=16, bottleneck_dim=8,
                       add_dim=12))
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    sharding = NamedSharding(mesh, P("data"))

    def batch_for(i):
        # must mirror tests/multihost_worker.py::ssl_equiv exactly
        r = np.random.default_rng(200 + i)
        return {"global_feats": r.standard_normal(
                    (8, 2, 20, 10)).astype(np.float32),
                "local_feats": r.standard_normal(
                    (8, 2, 10, 10)).astype(np.float32)}

    state = init_ssl_state(jax.random.PRNGKey(3), model,
                           batch_for(0)["global_feats"][0, :1], cfg, mesh,
                           "rdino")
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_rdino_train_step(model, cfg, mesh, host)
    losses = []
    for i in range(3):
        state, metrics = step(state, jax.device_put(batch_for(i), sharding))
        losses.append(float(metrics["loss"]))
    final = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    flat = np.concatenate([np.ravel(v) for v in sorted(
        jax.tree_util.tree_leaves(final["student"]["params"]),
        key=lambda a: a.size)])

    np.testing.assert_allclose(got["losses"], losses, atol=2e-5)
    np.testing.assert_allclose(got["params"], flat, atol=5e-5)
    np.testing.assert_allclose(got["center"], final["center"], atol=5e-5)
