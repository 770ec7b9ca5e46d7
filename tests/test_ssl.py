"""SSL losses vs the reference implementations + train-step smoke tests."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import has_reference

sys.path.insert(0, "/root/reference")


def _init_torch_dist():
    import torch.distributed as dist

    if not dist.is_initialized():
        import tempfile

        dist.init_process_group(
            "gloo", init_method=f"file://{tempfile.mktemp()}",
            world_size=1, rank=0)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_dino_loss_matches_reference():
    import torch

    _init_torch_dist()
    from speakerlab.loss.dino_loss import DINOLoss as TorchDINO

    from speaker3d_tpu.train.ssl_losses import dino_loss

    rng = np.random.default_rng(0)
    B, K, ncrops = 6, 32, 4
    student = rng.standard_normal((ncrops * B, K)).astype(np.float32)
    teacher = rng.standard_normal((2 * B, K)).astype(np.float32)

    tl = TorchDINO(out_dim=K, ncrops=ncrops, warmup_teacher_temp=0.04,
                   teacher_temp=0.07, warmup_teacher_temp_epochs=5, nepochs=10)
    want = float(tl(torch.from_numpy(student), torch.from_numpy(teacher),
                    epoch=7))
    want_center = tl.center.numpy()

    got, new_center = dino_loss(jnp.asarray(student), jnp.asarray(teacher),
                                jnp.zeros((1, K)), ncrops=ncrops,
                                teacher_temp=0.07)
    assert abs(float(got) - want) < 1e-5
    np.testing.assert_allclose(np.asarray(new_center), want_center, atol=1e-6)


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_sdpn_loss_matches_reference():
    import torch

    from speakerlab.loss.sdpn_loss import SDPNLoss as TorchSDPN

    from speaker3d_tpu.train.ssl_losses import sdpn_loss

    rng = np.random.default_rng(1)
    B, D, P = 5, 16, 12
    anchors = rng.standard_normal((4 * B, D)).astype(np.float32)
    targets = rng.standard_normal((B, D)).astype(np.float32)
    protos = rng.standard_normal((P, D)).astype(np.float32)
    labels = np.eye(P, dtype=np.float32)

    tl = TorchSDPN(tau=0.1, me_max=True)
    w_loss, w_rloss, _, _ = tl(
        torch.from_numpy(anchors), torch.from_numpy(targets),
        torch.from_numpy(protos), torch.from_numpy(labels))

    g_loss, g_rloss, _ = sdpn_loss(
        jnp.asarray(anchors), jnp.asarray(targets), jnp.asarray(protos),
        jnp.asarray(labels), tau=0.1, T=0.25, num_views=4)
    assert abs(float(g_loss) - float(w_loss)) < 1e-4
    assert abs(float(g_rloss) - float(w_rloss)) < 1e-5


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_koleo_loss_matches_reference():
    import torch

    from speakerlab.loss.keleo_loss import KoLeoLoss as TorchKoLeo

    from speaker3d_tpu.train.ssl_losses import koleo_loss

    rng = np.random.default_rng(2)
    x = rng.standard_normal((10, 8)).astype(np.float32)
    want = float(TorchKoLeo()(torch.from_numpy(x)))
    got = float(koleo_loss(jnp.asarray(x)))
    assert abs(got - want) < 1e-5


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_reg_loss_matches_reference():
    import torch

    _init_torch_dist()
    from speakerlab.loss.dino_loss import RegLoss as TorchReg

    from speaker3d_tpu.train.ssl_losses import reg_loss

    rng = np.random.default_rng(3)
    B, D = 6, 24
    tea = rng.standard_normal((2 * B, D)).astype(np.float32)
    stu = rng.standard_normal((2 * B, D)).astype(np.float32)
    tl = TorchReg(out_dim=D, std_coeff=5.0, cov_coeff=1.0, per_batch_size=B)
    want = float(tl(torch.from_numpy(tea), torch.from_numpy(stu)))
    got = float(reg_loss(jnp.asarray(tea), jnp.asarray(stu), std_coeff=5.0,
                         cov_coeff=1.0))
    assert abs(got - want) < 1e-4


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_rdino_head_parity():
    import torch

    from speakerlab.models.rdino.RDINO_Head import RDINOHead as TorchHead

    from speaker3d_tpu.compat import load_into_model
    from speaker3d_tpu.models.ssl_heads import RDINOHead

    torch.manual_seed(0)
    tm = TorchHead(in_dim=24, out_dim=64, add_dim=48, bottleneck_dim=16,
                   hidden_dim=32)
    tm.eval()
    x = np.random.default_rng(0).standard_normal((3, 24)).astype(np.float32)
    with torch.no_grad():
        w_reg, w_out = tm(torch.from_numpy(x))
    fm = RDINOHead(out_dim=64, hidden_dim=32, bottleneck_dim=16, add_dim=48)
    variables = load_into_model(fm, tm.state_dict(), x[:1])
    g_reg, g_out = fm.apply(variables, x)
    np.testing.assert_allclose(np.asarray(g_reg), w_reg.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_out), w_out.numpy(), atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_rdino_train_step_smoke():
    import flax.linen as nn

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
            x = nn.BatchNorm(use_running_average=not train,
                             axis_name=None if not train else None)(x)
            x = nn.relu(x)
            return x.mean(axis=1)

    cfg = SSLTrainConfig(out_dim=32, ncrops=4, step_per_epoch=2, epochs=3,
                         warmup_epochs=1, base_lr=0.01, freeze_last_layer=1)
    model = RDINOCombiner(
        backbone=TinyBackbone(),
        head=RDINOHead(out_dim=32, hidden_dim=16, bottleneck_dim=8, add_dim=12))
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])

    rngb = np.random.default_rng(0)
    B = 8
    batch = {
        "global_feats": rngb.standard_normal((B, 2, 20, 10)).astype(np.float32),
        "local_feats": rngb.standard_normal((B, 2, 10, 10)).astype(np.float32),
    }
    state = init_ssl_state(jax.random.PRNGKey(0), model,
                           batch["global_feats"][0, :1], cfg, mesh, "rdino")
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_rdino_train_step(model, cfg, mesh, host)

    t0 = host["teacher"]["params"]
    for _ in range(3):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(state["step"])) == 3
    t1 = jax.tree_util.tree_map(np.asarray, jax.device_get(state))["teacher"]["params"]
    diffs = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(), t0, t1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0  # teacher EMA moved


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sdpn_train_step_smoke():
    import flax.linen as nn

    from speaker3d_tpu.models.ssl_heads import SDPNCombiner, SDPNHead
    from speaker3d_tpu.parallel.mesh import make_mesh
    from speaker3d_tpu.train.ssl_train import (
        SSLTrainConfig,
        init_ssl_state,
        make_sdpn_train_step,
    )

    class TinyBackbone(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(16)(x).mean(axis=1)

    cfg = SSLTrainConfig(num_proto=12, output_dim=8, step_per_epoch=2,
                         epochs=3, warmup_epochs=1, base_lr=0.01,
                         num_local_views=4)
    model = SDPNCombiner(backbone=TinyBackbone(),
                         head=SDPNHead(hidden_dim=16, bottleneck_dim=8))
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])

    rngb = np.random.default_rng(1)
    B = 8
    batch = {
        "global_feats": rngb.standard_normal((B, 1, 20, 10)).astype(np.float32),
        "local_feats": rngb.standard_normal((B, 4, 10, 10)).astype(np.float32),
    }
    state = init_ssl_state(jax.random.PRNGKey(1), model,
                           batch["global_feats"][0, :1], cfg, mesh, "sdpn")
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    step = make_sdpn_train_step(model, cfg, mesh, host)

    p0 = host["prototypes"]
    for _ in range(3):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    p1 = np.asarray(jax.device_get(state["prototypes"]))
    assert np.abs(p1 - p0).max() > 0  # prototypes learn


# ---------------------------------------------------------------------------
# N=1 vs N=4 distributed-numerics equivalence (VERDICT r1 item 3): the
# psum-sinkhorn, teacher centering, VICReg gather, ME-MAX and SyncBN terms
# must make an N-device step equal the single-device step on the same global
# batch. (KoLeo is per-rank BY REFERENCE SEMANTICS — torch computes it on the
# local batch with no gather, loss/keleo_loss.py — so the SDPN equivalence
# runs with koleo_weight=0; KoLeo itself is parity-tested above.)
# ---------------------------------------------------------------------------


def _synced_tiny_backbone():
    import flax.linen as nn

    from speaker3d_tpu.models.common import batch_norm

    class TinyBackbone(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(16)(x)
            x = batch_norm(train, name="bn")(x)
            x = nn.relu(x)
            return x.mean(axis=1)

    return TinyBackbone()


def _host(tree):
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def _assert_trees_close(a, b, atol, rtol=1e-5):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert [str(k) for k, _ in fa] == [str(k) for k, _ in fb]
    for (k, va), (_, vb) in zip(fa, fb):
        np.testing.assert_allclose(va, vb, atol=atol, rtol=rtol,
                                   err_msg=str(k))


def _run_ssl(variant, n_data, n_steps=3, proto_lr=0.02):
    from speaker3d_tpu.parallel.mesh import make_mesh
    from speaker3d_tpu.train.ssl_train import (
        SSLTrainConfig,
        init_ssl_state,
        make_rdino_train_step,
        make_sdpn_train_step,
    )

    mesh = make_mesh(n_data, 1, devices=jax.devices()[:n_data])
    rngb = np.random.default_rng(42)
    B = 8
    if variant == "rdino":
        from speaker3d_tpu.models.ssl_heads import RDINOCombiner, RDINOHead

        cfg = SSLTrainConfig(out_dim=32, ncrops=4, step_per_epoch=2, epochs=3,
                             warmup_epochs=1, base_lr=0.02,
                             freeze_last_layer=1)
        model = RDINOCombiner(
            backbone=_synced_tiny_backbone(),
            head=RDINOHead(out_dim=32, hidden_dim=16, bottleneck_dim=8,
                           add_dim=12))
        g_shape, l_shape = (B, 2, 20, 10), (B, 2, 10, 10)
        make_step = make_rdino_train_step
    else:
        from speaker3d_tpu.models.ssl_heads import SDPNCombiner, SDPNHead

        cfg = SSLTrainConfig(num_proto=12, output_dim=8, step_per_epoch=2,
                             epochs=3, warmup_epochs=1, base_lr=0.02,
                             num_local_views=4, koleo_weight=0.0,
                             use_sinkhorn=True, proto_lr=proto_lr)
        model = SDPNCombiner(backbone=_synced_tiny_backbone(),
                             head=SDPNHead(hidden_dim=16, bottleneck_dim=8))
        g_shape, l_shape = (B, 1, 20, 10), (B, 4, 10, 10)
        make_step = make_sdpn_train_step

    batches = []
    for i in range(n_steps):
        r = np.random.default_rng(100 + i)
        batches.append({
            "global_feats": r.standard_normal(g_shape).astype(np.float32),
            "local_feats": r.standard_normal(l_shape).astype(np.float32),
        })
    state = init_ssl_state(jax.random.PRNGKey(3), model,
                           batches[0]["global_feats"][0, :1], cfg, mesh,
                           variant)
    step = make_step(model, cfg, mesh, _host(state))
    metrics_seq = []
    for batch in batches:
        state, metrics = step(state, batch)
        metrics_seq.append({k: float(v) for k, v in metrics.items()})
    return _host(state), metrics_seq


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_rdino_multi_device_matches_single_device():
    s1, m1 = _run_ssl("rdino", 1)
    s4, m4 = _run_ssl("rdino", 4)
    for a, b in zip(m1, m4):
        for key in ("loss", "dino_loss", "reg_loss"):
            assert abs(a[key] - b[key]) < 2e-5, (key, a[key], b[key])
    for part in ("student", "teacher", "momentum", "center"):
        _assert_trees_close(s1[part], s4[part], atol=5e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sdpn_multi_device_matches_single_device():
    """Reference semantics: prototype grads are all-reduce-SUMMED
    (train_sdpn.py:224), so the N-device prototype gradient is N x the
    single-process global-batch gradient by design. With SGD momentum that
    is exactly equivalent to scaling proto_lr by N — so the N=4 run must
    match an N=1 run with proto_lr*4, everywhere, to fp32 tolerance.
    Everything else (CE pmean, identity-backward ME-MAX, sinkhorn psums,
    SyncBN) must be N-invariant outright."""
    s1, m1 = _run_ssl("sdpn", 1, proto_lr=0.08)
    s4, m4 = _run_ssl("sdpn", 4, proto_lr=0.02)
    for a, b in zip(m1, m4):
        for key in ("loss", "ploss", "memax"):
            assert abs(a[key] - b[key]) < 2e-5, (key, a[key], b[key])
    for part in ("student", "teacher", "momentum", "prototypes",
                 "proto_momentum"):
        if part == "proto_momentum":
            # momentum buffers carry the raw (N x) gradient scale
            np.testing.assert_allclose(4.0 * s1[part], s4[part], atol=2e-4,
                                       rtol=1e-5)
            continue
        _assert_trees_close(s1[part], s4[part], atol=5e-5)
