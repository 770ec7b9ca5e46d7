"""SSL (RDINO/SDPN) training-step throughput, one chip.

Runs the production compiled multi-crop step (melspec on device, student
fwd over global+local crops, teacher fwd, DINO/SDPN loss with
centering/sinkhorn, clip, SGD, teacher EMA) on synthetic crops and reports
audio-seconds/s/chip.

Default methodology: in-jit lax.fori_loop around the step with
per-iteration input variation and a params checksum fetch (docs/DESIGN.md)
— the device-capability number comparable to the supervised rows in
docs/BENCH.md. Pass `seq` as the 3rd arg for the old sequential-dispatch
mode (each step re-uploads the wav batch through the tunnel; that mode
understates device capability on this harness).

Run from /root/repo (cwd supplies the import path — no PYTHONPATH on TPU):
    python -c "exec(open('tools/bench_train_ssl.py').read())" \
        [variant(rdino|sdpn)] [batch] [seq]
"""

import json
import sys
import time

import numpy as np

STEPS = 10
GLB_SECONDS, LOC_SECONDS = 4.0, 2.0
FS = 16000


def bench_ssl(variant: str = "rdino", batch: int = 64,
              sequential: bool = False) -> dict:
    import jax

    from speaker3d_tpu.cli.train_ssl import build_ssl_model
    from speaker3d_tpu.ops.melspec import MelSpecConfig, MelSpectrogram
    from speaker3d_tpu.parallel.mesh import make_mesh
    from speaker3d_tpu.train.ssl_train import (
        SSLTrainConfig,
        init_ssl_state,
        make_rdino_train_step,
        make_sdpn_train_step,
    )

    glb_num, local_num = 2, 4
    if variant == "sdpn":
        glb_num = 1
    config = {}
    cfg = SSLTrainConfig(
        base_lr=0.2 * batch / 256.0, min_lr=1e-5, epochs=150,
        step_per_epoch=1000, warmup_epochs=10, weight_decay=1e-4,
        weight_decay_end=1e-4, momentum_teacher=0.996, clip_grad=3.0,
        freeze_last_layer=1, ncrops=glb_num + local_num, out_dim=65536,
        num_proto=1024, output_dim=256, num_local_views=local_num,
        memax_weight=1.0, koleo_weight=0.1)
    model = build_ssl_model(variant, config)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    melspec = MelSpectrogram(MelSpecConfig(n_mels=80))

    rng = np.random.default_rng(0)
    glb = (rng.standard_normal((batch, glb_num, int(GLB_SECONDS * FS)))
           * 0.1).astype(np.float32)
    loc = (rng.standard_normal((batch, local_num, int(LOC_SECONDS * FS)))
           * 0.1).astype(np.float32)

    example = np.asarray(melspec(glb[0, :1]))
    state = init_ssl_state(jax.random.PRNGKey(0), model, example, cfg,
                           mesh, variant)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    make_step = (make_rdino_train_step if variant == "rdino"
                 else make_sdpn_train_step)
    step_fn = make_step(model, cfg, mesh, host, feature_fn=melspec)

    if sequential:
        batch_d = {"global_wavs": glb, "local_wavs": loc}
        state, metrics = step_fn(state, batch_d)            # compile
        _ = float(next(iter(metrics.values())))             # force
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = step_fn(state, batch_d)
        _ = float(next(iter(metrics.values())))             # fetch
        elapsed = time.perf_counter() - t0
    else:
        import jax.numpy as jnp

        glb_d = jax.device_put(glb)
        loc_d = jax.device_put(loc)

        def loop(st, g, l):
            def body(i, s):
                scale = 1.0 + i.astype(jnp.float32) * 1e-6
                s, _ = step_fn(s, {"global_wavs": g * scale,
                                   "local_wavs": l * scale})
                return s
            st = jax.lax.fori_loop(0, STEPS, body, st)
            # checksum over the UPDATED params so XLA can't DCE the body
            return sum(jnp.sum(jnp.abs(p).astype(jnp.float32))
                       for p in jax.tree_util.tree_leaves(
                           st["student"]["params"]))

        run = jax.jit(loop)
        checksum = float(run(state, glb_d, loc_d))   # compile + warm
        assert np.isfinite(checksum)
        t0 = time.perf_counter()
        checksum = float(run(state, glb_d, loc_d))
        elapsed = time.perf_counter() - t0
        assert np.isfinite(checksum)

    audio_s = batch * (glb_num * GLB_SECONDS + local_num * LOC_SECONDS)
    return {
        "metric": "ssl_train_throughput", "variant": variant,
        "batch": batch, "steps": STEPS,
        "mode": "sequential" if sequential else "in-jit",
        "value": round(audio_s * STEPS / elapsed, 1),
        "unit": "audio-seconds/s/chip",
        "utts_per_s": round(batch * STEPS / elapsed, 1),
    }


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "rdino"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sequential = len(sys.argv) > 3 and sys.argv[3] == "seq"
    print(json.dumps(bench_ssl(variant, batch, sequential)))


if __name__ == "__main__":  # exec(open(...)) in `python -c` hits this too
    main()
