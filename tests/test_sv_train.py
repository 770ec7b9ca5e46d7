"""Train-step tests on a virtual 8-device CPU mesh.

Validates: (a) the vocab-parallel (model-axis) math is numerically identical
to an unsharded classifier — compared at fixed data-axis size, since
BatchNorm intentionally uses local-batch statistics (torch-DDP semantics) and
therefore the data-axis size is part of the numerics; (b) the vocab-parallel
AAM loss equals the plain full-classifier AAM loss (BN-free model, padded
class count); (c) training learns a separable toy problem.
"""

import flax.linen as nn
import jax
import numpy as np
import pytest

from speaker3d_tpu.parallel.mesh import make_mesh
from speaker3d_tpu.train.losses import arc_margin_loss
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


class TinyModelNoBN(nn.Module):
    emb: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Dense(32)(x))
        return nn.Dense(self.emb)(x.mean(axis=1))


CFG = SVTrainConfig(num_classes=10, embedding_size=16, max_lr=0.05,
                    min_lr=1e-3, warmup_epoch=1, fix_epoch=10,
                    step_per_epoch=10, increase_start_epoch=2,
                    margin_fix_epoch=5, final_margin=0.2)


def _batch(seed=0, b=8, t=12, f=20, num_classes=10):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, b)
    feats = rng.standard_normal((b, t, f)).astype(np.float32) * 0.1
    for i, lab in enumerate(labels):
        feats[i, :, lab] += 2.0
    return {"feats": feats, "labels": labels.astype(np.int32)}


def _get(tree):
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_model_axis_matches_unsharded_classifier():
    """(4 data, 2 model) must equal (4 data, 1 model) bit-for-bit-ish."""
    model = TinyModel()
    rng = jax.random.PRNGKey(0)
    batch = _batch()

    mesh42 = make_mesh(4, 2)
    mesh41 = make_mesh(4, 1, devices=jax.devices()[:4])

    state42 = init_sv_train_state(rng, model, batch["feats"][:1], CFG, mesh42)
    host = _get(state42)
    state41 = init_sv_train_state(rng, model, batch["feats"][:1], CFG, mesh41)
    np.testing.assert_allclose(_get(state41)["cls_w"], host["cls_w"])

    step42 = make_sv_train_step(model, CFG, mesh42, host)
    step41 = make_sv_train_step(model, CFG, mesh41, host)

    new42, m42 = step42(state42, batch)
    new41, m41 = step41(state41, batch)

    assert abs(float(m42["loss"]) - float(m41["loss"])) < 1e-5
    assert abs(float(m42["acc"]) - float(m41["acc"])) < 1e-6
    a, b = _get(new42), _get(new41)
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    for (pa, va), (pb, vb) in zip(sorted(fa, key=lambda kv: str(kv[0])),
                                  sorted(fb, key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(va, vb, atol=2e-5, err_msg=str(pa))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_loss_equals_plain_aam():
    """Vocab-parallel AAM (with class padding: 9 classes over 2 shards)
    equals the plain full-classifier AAM loss. BN-free model so the plain
    full-batch forward is exactly the sharded one."""
    cfg = CFG._replace(num_classes=9)
    model = TinyModelNoBN()
    rng = jax.random.PRNGKey(1)
    batch = _batch(seed=3, num_classes=9)
    mesh = make_mesh(4, 2)
    state = init_sv_train_state(rng, model, batch["feats"][:1], cfg, mesh)
    host = _get(state)
    step = make_sv_train_step(model, cfg, mesh, host)
    _, metrics = step(state, batch)

    out = model.apply({"params": host["params"]}, batch["feats"], train=True)
    out = np.asarray(out)
    w = host["cls_w"][:cfg.num_classes]
    cos = (out / np.linalg.norm(out, axis=-1, keepdims=True)) @ (
        w / np.linalg.norm(w, axis=-1, keepdims=True)).T
    want = float(arc_margin_loss(np.asarray(cos, np.float32),
                                 batch["labels"], 0.0, scale=cfg.scale))
    assert abs(float(metrics["loss"]) - want) < 1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_remat_matches_plain():
    """jax.checkpoint remat must not change the step's numerics."""
    model = TinyModel()
    rng = jax.random.PRNGKey(5)
    batch = _batch(seed=9)
    mesh = make_mesh(4, 2)
    state_a = init_sv_train_state(rng, model, batch["feats"][:1], CFG, mesh)
    host = _get(state_a)
    state_b = init_sv_train_state(rng, model, batch["feats"][:1], CFG, mesh)
    step_a = make_sv_train_step(model, CFG, mesh, host)
    step_b = make_sv_train_step(model, CFG._replace(remat=True), mesh, host)
    new_a, ma = step_a(state_a, batch)
    new_b, mb = step_b(state_b, batch)
    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-6
    fa = jax.tree_util.tree_flatten_with_path(_get(new_a))[0]
    fb = jax.tree_util.tree_flatten_with_path(_get(new_b))[0]
    for (pa, va), (pb, vb) in zip(sorted(fa, key=lambda kv: str(kv[0])),
                                  sorted(fb, key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(va, vb, atol=1e-6, err_msg=str(pa))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_per_block_remat_matches_plain():
    """Models with a `remat` field (ERes2NetV2) get per-block nn.remat via
    cfg.remat — parameter paths and step numerics must be unchanged."""
    from speaker3d_tpu.models.eres2netv2 import ERes2NetV2

    model = ERes2NetV2(num_blocks=(1, 1, 1, 1), m_channels=8, feat_dim=20,
                       embedding_size=16)
    rng = jax.random.PRNGKey(7)
    batch = _batch(seed=11)
    mesh = make_mesh(4, 2)

    # identical init pytrees (same scope paths under nn.remat)
    va = jax.jit(model.init, static_argnames=("train",))(
        rng, batch["feats"][:1], train=True)
    vb = jax.jit(model.clone(remat=True).init, static_argnames=("train",))(
        rng, batch["feats"][:1], train=True)
    pa = jax.tree_util.tree_flatten_with_path(_get(va))[0]
    pb = jax.tree_util.tree_flatten_with_path(_get(vb))[0]
    assert [str(k) for k, _ in pa] == [str(k) for k, _ in pb]
    for (k, a), (_, b) in zip(pa, pb):
        np.testing.assert_array_equal(a, b, err_msg=str(k))

    state_a = init_sv_train_state(rng, model, batch["feats"][:1], CFG, mesh)
    host = _get(state_a)
    state_b = init_sv_train_state(rng, model, batch["feats"][:1], CFG, mesh)
    step_a = make_sv_train_step(model, CFG, mesh, host)
    step_b = make_sv_train_step(model, CFG._replace(remat=True), mesh, host)
    new_a, ma = step_a(state_a, batch)
    new_b, mb = step_b(state_b, batch)
    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-6
    fa = jax.tree_util.tree_flatten_with_path(_get(new_a))[0]
    fb = jax.tree_util.tree_flatten_with_path(_get(new_b))[0]
    for (p, va_), (_, vb_) in zip(sorted(fa, key=lambda kv: str(kv[0])),
                                  sorted(fb, key=lambda kv: str(kv[0]))):
        # recomputation re-fuses the backward float ops, so gradients (and
        # hence the updated params/momentum) carry ~1e-4-level drift through
        # the 4-stage BN chains rather than being bit-identical; the loss
        # itself matches to 1e-6 above
        np.testing.assert_allclose(va_, vb_, atol=5e-4, rtol=5e-4,
                                   err_msg=str(p))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_bf16_compute_learns():
    """Mixed-precision training runs and learns (looser numerics)."""
    model = TinyModel()
    mesh = make_mesh(4, 2)
    cfg = CFG._replace(compute_dtype="bfloat16")
    batch = _batch(seed=0)
    state = init_sv_train_state(jax.random.PRNGKey(3), model,
                                batch["feats"][:1], cfg, mesh)
    step = make_sv_train_step(model, cfg, mesh, _get(state))
    losses = []
    for i in range(40):
        state, metrics = step(state, _batch(seed=i % 4))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_training_learns():
    model = TinyModel()
    rng = jax.random.PRNGKey(2)
    mesh = make_mesh(4, 2)
    batch = _batch(seed=0)
    state = init_sv_train_state(rng, model, batch["feats"][:1], CFG, mesh)
    step = make_sv_train_step(model, CFG, mesh, _get(state))

    losses, accs = [], []
    for i in range(60):
        state, metrics = step(state, _batch(seed=i % 4))
        losses.append(float(metrics["loss"]))
        accs.append(float(metrics["acc"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert np.mean(accs[-8:]) > 0.8, accs[-8:]
    assert int(_get(state)["step"]) == 60


def test_int16_wire_matches_float32():
    """PCM16 wire format (BatchLoader wire_dtype='int16'): the device-side
    k/32768 reconstruction makes the step BITWISE identical to feeding the
    same float32 values, and the loader's quantization is an exact
    round-trip for PCM16-decoded samples."""
    model = TinyModelNoBN()
    rng = jax.random.PRNGKey(3)
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])

    # wav-domain batch: values on the PCM16 grid k/32768
    g = np.random.default_rng(0)
    k = g.integers(-32768, 32768, size=(8, 80), dtype=np.int64)
    wavs32 = (k / 32768.0).astype(np.float32)
    labels = g.integers(0, 10, 8).astype(np.int32)

    def feature_fn(w):
        return w.reshape(w.shape[0], 4, 20)

    state0 = init_sv_train_state(rng, model, feature_fn(wavs32[:1]), CFG,
                                 mesh)
    host0 = _get(state0)
    step = make_sv_train_step(model, CFG, mesh, host0,
                              feature_fn=feature_fn)

    s_f32, m_f32 = step(state0, {"wavs": wavs32, "labels": labels})
    state0b = jax.device_put(host0)
    s_i16, m_i16 = step(state0b, {"wavs": k.astype(np.int16),
                                  "labels": labels})
    assert float(m_f32["loss"]) == float(m_i16["loss"])
    a, b = _get(s_f32)["params"], _get(s_i16)["params"]
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(la, lb)

    # loader emits int16 that reconstructs the dataset's float32 exactly
    from speaker3d_tpu.data.dataset import BatchLoader

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return wavs32[i], np.int32(labels[i])

    loader = BatchLoader(_DS(), batch_size=8, shuffle=False, num_workers=2,
                         wire_dtype="int16")
    batch = next(iter(loader))
    assert batch["wavs"].dtype == np.int16
    np.testing.assert_array_equal(
        batch["wavs"].astype(np.float32) / 32768.0, wavs32)
