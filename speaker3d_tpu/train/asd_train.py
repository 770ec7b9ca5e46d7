"""Active speaker detection (TalkNet) training step.

Behavioral contract (reference: speakerlab/bin/train_asd.py:124-176): per
step — forward AV/A/V scores over frames, loss = CE(AV) + 0.4 CE(A) +
0.4 CE(V) against per-frame binary labels, Adam update, epoch-level LR
schedule; evaluation computes mAP via average precision over frame scores
(:178-240, utils.average_precision).

TPU-native: one shard_map-compiled step over the 'data' axis; Adam
implemented torch-style.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speaker3d_tpu.train.losses import entropy_loss


class ASDTrainConfig(NamedTuple):
    lr: float = 1e-4
    lr_decay: float = 0.95       # per-epoch staircase (reference conf)
    step_per_epoch: int = 1000
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    aux_weight: float = 0.4


def init_asd_train_state(rng, model, example_audio, example_visual,
                         cfg: ASDTrainConfig, mesh: Mesh):
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, example_audio, example_visual, train=True)
    params = variables["params"]
    state = {
        "params": params,
        "batch_stats": variables.get("batch_stats", {}),
        "mu": jax.tree_util.tree_map(jnp.zeros_like, params),
        "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
    }
    sharding = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), state)
    return jax.device_put(state, sharding)


def make_asd_train_step(model, cfg: ASDTrainConfig, mesh: Mesh,
                        state_example) -> Callable:
    specs = jax.tree_util.tree_map(lambda _: P(), state_example)
    batch_specs = {"audio": P("data"), "visual": P("data"),
                   "labels": P("data")}

    def shard_body(state, batch):
        step = state["step"]
        epoch = (step // cfg.step_per_epoch).astype(jnp.float32)
        lr = cfg.lr * jnp.power(cfg.lr_decay, epoch)

        def loss_fn(params):
            (av, a, v), mut = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                batch["audio"], batch["visual"], train=True,
                mutable=["batch_stats"])
            labels = batch["labels"]
            loss = (entropy_loss(av, labels)
                    + cfg.aux_weight * entropy_loss(a, labels)
                    + cfg.aux_weight * entropy_loss(v, labels))
            scores = jax.nn.softmax(av, axis=-1)[..., 1]
            return loss, (mut["batch_stats"], scores)

        (loss, (new_bs, scores)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        grads = jax.lax.pmean(grads, "data")
        new_bs = jax.lax.pmean(new_bs, "data")

        t = (step + 1).astype(jnp.float32)

        def adam(p, g, mu, nu):
            mu = cfg.beta1 * mu + (1 - cfg.beta1) * g
            nu = cfg.beta2 * nu + (1 - cfg.beta2) * jnp.square(g)
            mu_hat = mu / (1 - jnp.power(cfg.beta1, t))
            nu_hat = nu / (1 - jnp.power(cfg.beta2, t))
            return p - lr * mu_hat / (jnp.sqrt(nu_hat) + cfg.eps), mu, nu

        flat_p, treedef = jax.tree_util.tree_flatten(state["params"])
        upd = [adam(p, g, mu, nu) for p, g, mu, nu in zip(
            flat_p, jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(state["mu"]),
            jax.tree_util.tree_leaves(state["nu"]))]
        new_state = {
            "params": jax.tree_util.tree_unflatten(treedef, [u[0] for u in upd]),
            "batch_stats": new_bs,
            "mu": jax.tree_util.tree_unflatten(treedef, [u[1] for u in upd]),
            "nu": jax.tree_util.tree_unflatten(treedef, [u[2] for u in upd]),
            "step": step + 1,
        }
        metrics = {"loss": jax.lax.pmean(loss, "data"), "lr": lr,
                   "scores": scores}
        return new_state, metrics

    fn = jax.shard_map(shard_body, mesh=mesh, in_specs=(specs, batch_specs),
                       out_specs=(specs, {"loss": P(), "lr": P(),
                                          "scores": P("data")}),
                       check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))
