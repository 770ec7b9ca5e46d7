"""Worker process for the 2-process jax.distributed integration tests.

Launched by tests/test_multihost.py with SPEAKER3D_COORDINATOR_ADDRESS /
SPEAKER3D_NUM_PROCESSES / SPEAKER3D_PROCESS_ID env set; init_multihost()
(the same call every CLI main() makes) performs the jax.distributed
initialization — this worker validates the exact code path a real pod uses
(reference equivalent: torchrun per-rank env + dist.init_process_group,
speakerlab/bin/train.py:34).

Tasks:
  step_equiv <out.npz>   — 3 sv_train steps on a 2-process mesh; rank 0
                           writes losses + updated-parameter vector.
  train_cli <config>     — run the real cli.train main().
  extract_cli <args...>  — run the real cli.extract main().
"""

import faulthandler
import os
import signal as _signal
import sys

faulthandler.register(_signal.SIGUSR1)  # stack dump for hang debugging

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def tiny_batch(seed=0, b=8, t=12, f=20, num_classes=10):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, b)
    feats = rng.standard_normal((b, t, f)).astype(np.float32) * 0.1
    for i, lab in enumerate(labels):
        feats[i, :, lab] += 2.0
    return {"feats": feats, "labels": labels.astype(np.int32)}


def step_equiv(out_path):
    import flax.linen as nn
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speaker3d_tpu.parallel.mesh import make_mesh
    from speaker3d_tpu.train.sv_train import (
        SVTrainConfig,
        init_sv_train_state,
        make_sv_train_step,
    )

    class TinyModel(nn.Module):
        emb: int = 16

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Dense(32)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            return nn.Dense(self.emb)(x.mean(axis=1))

    cfg = SVTrainConfig(num_classes=10, embedding_size=16, max_lr=0.05,
                        min_lr=1e-3, warmup_epoch=1, fix_epoch=10,
                        step_per_epoch=10, increase_start_epoch=2,
                        margin_fix_epoch=5, final_margin=0.2)
    model = TinyModel()
    rng = jax.random.PRNGKey(0)
    mesh = make_mesh(data=2, model=1)  # 2 global devices, 1 per process
    sharding = NamedSharding(mesh, P("data"))

    example = tiny_batch(seed=0)["feats"][:1]
    state = init_sv_train_state(rng, model, example, cfg, mesh)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_sv_train_step(model, cfg, mesh, host)

    pid, nproc = jax.process_index(), jax.process_count()
    losses = []
    for i in range(3):
        g = tiny_batch(seed=i)  # the GLOBAL batch, same on both processes
        b = g["labels"].shape[0]
        lo, hi = pid * b // nproc, (pid + 1) * b // nproc
        local = {k: v[lo:hi] for k, v in g.items()}
        batch = jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            local)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))

    final = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    if pid == 0:
        flat = np.concatenate([np.ravel(v) for v in sorted(
            jax.tree_util.tree_leaves(final["params"]), key=lambda a: a.size)])
        np.savez(out_path, losses=np.asarray(losses), params=flat,
                 cls_w=final["cls_w"])


def ssl_equiv(out_path):
    """3 RDINO steps on the 2-process mesh; rank 0 writes losses +
    student-parameter vector (SyncBN, DINO centering, VICReg gather over
    Gloo must equal the in-process result)."""
    import flax.linen as nn
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
    mesh = make_mesh(data=2, model=1)
    sharding = NamedSharding(mesh, P("data"))

    def batch_for(i):
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

    pid, nproc = jax.process_index(), jax.process_count()
    losses = []
    for i in range(3):
        g = batch_for(i)
        b = g["global_feats"].shape[0]
        lo, hi = pid * b // nproc, (pid + 1) * b // nproc
        local = {k: v[lo:hi] for k, v in g.items()}
        batch = jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            local)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))

    final = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    if pid == 0:
        flat = np.concatenate([np.ravel(v) for v in sorted(
            jax.tree_util.tree_leaves(final["student"]["params"]),
            key=lambda a: a.size)])
        np.savez(out_path, losses=np.asarray(losses), params=flat,
                 center=final["center"])


def main():
    task = sys.argv[1]
    if task == "step_equiv":
        from speaker3d_tpu.parallel.mesh import init_multihost

        assert init_multihost(), "coordinator env not picked up"
        assert jax.process_count() == 2, jax.process_count()
        step_equiv(sys.argv[2])
    elif task == "ssl_equiv":
        from speaker3d_tpu.parallel.mesh import init_multihost

        assert init_multihost(), "coordinator env not picked up"
        assert jax.process_count() == 2, jax.process_count()
        ssl_equiv(sys.argv[2])
    elif task == "train_cli":
        from speaker3d_tpu.cli.train import main as train_main

        train_main(["--config", sys.argv[2]])
    elif task == "extract_cli":
        from speaker3d_tpu.cli.extract import main as extract_main

        extract_main(sys.argv[2:])
    else:
        raise SystemExit(f"unknown task {task}")
    # keep the coordinator (process 0) alive until every process is done
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("worker_done")


if __name__ == "__main__":
    main()
