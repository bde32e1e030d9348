"""Train state and jit-compiled train/eval steps.

TPU-native replacement for the reference's Lightning ModelWithLoss + Trainer
(/root/reference/src/lib/model/modelWithLoss.py:24-361, trainer.py:20-127):
one functional train step (forward + loss + grad + optax update + BN stats),
compiled once under jit and sharded over the device mesh by the caller.
Backbone freezing (MODEL.FREEZE_BACKBONE / DEFREEZE) differentiates only the
head subtrees (backbone params are non-diff constants, so the backbone
backward is pruned from the compiled step entirely) and zero-fills backbone
grads for the optimizer, mirroring the reference's requires_grad toggling
(dla.py:618-621, modelWithLoss.py:275-297).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

BACKBONE_KEYS = ("base", "dla_up", "ida_up")
WEIGHT_DECAY = 5e-4


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, update_mask=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        if update_mask is not None:
            # zero the whole update (incl. decoupled weight decay) for frozen
            # subtrees - torch skips no-grad params entirely, so frozen params
            # must not decay either
            updates = update_mask(updates)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def scale_by_adam_perparam(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with torch's PER-PARAMETER step counts.

    torch.optim.Adam keeps ``state['step']`` per param and skips params
    whose ``.grad`` is None — so a backbone frozen for 150 epochs gets
    bias correction from t=1 the step it defrosts
    (modelWithLoss.py:275-297 just flips requires_grad). optax's single
    global count instead hands freshly-activated params NO bias
    correction (at t=150, 1-b1^t ~ 1), i.e. an effective LR up to
    ~3-7x for their first steps — measured to spike the overfit loss
    4.1 -> ~1e5 across the defreeze boundary (scripts/overfit_tpu.py).
    A leaf's count starts incrementing once it has ever seen a nonzero
    gradient (the frozen phase zero-fills backbone grads, which leaves
    their zero-initialized moments untouched, exactly like torch's
    skip). For always-active params every count equals the global step,
    so trajectories stay element-exact with torch.optim (optimizer.npz
    golden).

    Known approximation: activity is inferred from gradient VALUES, so
    the torch-exactness claim holds only when zero grads come from the
    freeze mask. A leaf whose grad tensor is present but happens to be
    all-zero (e.g. a focal-loss head whose classes are absent from the
    early batches) DOES tick torch's step counter but not this one; its
    first real update here uses a smaller t, i.e. a slightly larger
    bias-corrected LR for its first few steps. Threading an explicit
    frozen mask in would close this, but the value-inferred form keeps
    the transform usable outside the Trainer (no mask plumbing) and the
    discrepancy decays as b1^t within ~10 steps.
    """

    def init(params):
        z = lambda t: jnp.zeros_like(t)
        return {
            "count": jax.tree.map(
                lambda t: jnp.zeros((), jnp.int32), params),
            "mu": jax.tree.map(z, params),
            "nu": jax.tree.map(z, params),
        }

    def update(updates, state, params=None):
        del params
        active = jax.tree.map(
            lambda g, c: ((c > 0) | jnp.any(g != 0)).astype(jnp.int32),
            updates, state["count"])
        count = jax.tree.map(lambda c, a: c + a, state["count"], active)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * (g * g),
                          state["nu"], updates)

        def corrected(m, v, c):
            # c = 0 -> m, v are exactly zero; guard the 0/0. Bias terms in
            # the moment dtype (>= f32) so f64 anchor runs stay f64-exact.
            ct = c.astype(jnp.promote_types(m.dtype, jnp.float32))
            bc1 = jnp.where(c > 0, 1.0 - b1 ** ct, 1.0)
            bc2 = jnp.where(c > 0, 1.0 - b2 ** ct, 1.0)
            return (m / bc1) / (jnp.sqrt(v / bc2) + eps)

        out = jax.tree.map(corrected, mu, nu, count)
        return out, {"count": count, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init, update)


def make_optimizer(config) -> optax.GradientTransformation:
    """AdamW(wd 5e-4) or SGD(momentum .9, wd 5e-4) with injectable LR."""
    name = config.TRAIN.OPTIMIZER

    def make(learning_rate):
        if name == "adam":
            # same composition as optax.adamw (scale_by_adam ->
            # add_decayed_weights -> -lr), with per-param counts
            return optax.chain(
                scale_by_adam_perparam(),
                optax.add_decayed_weights(WEIGHT_DECAY),
                optax.scale_by_learning_rate(learning_rate),
            )
        if name == "sgd":
            return optax.chain(
                optax.add_decayed_weights(WEIGHT_DECAY),
                optax.sgd(learning_rate, momentum=0.9),
            )
        raise ValueError(f"unknown optimizer {name!r}")

    return optax.inject_hyperparams(make)(learning_rate=float(config.TRAIN.LR))


def create_train_state(config, model, variables) -> TrainState:
    tx = make_optimizer(config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def mask_backbone_grads(grads):
    """Zero gradients of the backbone subtrees (frozen-backbone phase)."""
    return {
        k: (jax.tree.map(jnp.zeros_like, v) if k in BACKBONE_KEYS else v)
        for k, v in grads.items()
    }


def make_train_step(model, loss_fn, freeze_backbone: bool = False,
                    accum_steps: int = 1) -> Callable:
    """Build the jittable train step.

    Returns step(state, batch, lr) -> (state, metrics). ``lr`` is a traced
    scalar injected into the optimizer, so LR decay never recompiles.

    ``accum_steps > 1`` (TRAIN.GRAD_ACCUM) runs the forward/backward over
    ``accum_steps`` sequential microbatches under ``lax.scan`` and applies
    ONE optimizer update with the gradient MEAN — large effective batches at
    microbatch activation memory. Semantics match the reference's DDP
    (trainer.py:65-69): each microbatch normalizes its own loss (e.g. the
    focal loss divides by the microbatch's positive count, exactly like a
    DDP rank divides by its local count) and the per-microbatch gradients
    are averaged; BN batch stats update sequentially per microbatch, again
    like DDP ranks. The full batch is split on the leading axis —
    TRAIN.BATCH_SIZE must be divisible by GRAD_ACCUM.
    """

    def train_step(state: TrainState, batch: Dict[str, Any], lr):
        def loss_from(params, stats, mbatch):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": stats},
                mbatch["image"],
                mbatch.get("pc_hm"),
                mbatch.get("pc_dep"),
                mbatch.get("calib"),
                train=True,
                mutable=["batch_stats"],
            )
            total, parts = loss_fn(outputs, mbatch)
            return total, (parts, updates["batch_stats"])

        def one_micro(stats, mbatch):
            """grads/loss/stats for one microbatch (full batch if accum=1)."""
            if freeze_backbone:
                # differentiate ONLY the live (head) subtrees; the backbone
                # params enter as non-diff closure constants, so autodiff
                # prunes the whole backbone backward (no image gradient path
                # exists). Numerically identical to full-grad +
                # mask_backbone_grads — head grads depend only on feature
                # VALUES — but ~2x faster at bs8 448x800: the shift-DCN
                # backward (the dominant training cost) vanishes for the 85%
                # of flagship epochs that run frozen (Centerfusion_Middle
                # DEFREEZE=170 of 200; reference freezes by requires_grad
                # toggling, dla.py:618-621).
                frozen_sub = {k: v for k, v in state.params.items()
                              if k in BACKBONE_KEYS}
                live_sub = {k: v for k, v in state.params.items()
                            if k not in BACKBONE_KEYS}

                def compute_loss(live):
                    return loss_from({**frozen_sub, **live}, stats, mbatch)

                (total, (parts, new_stats)), live_grads = jax.value_and_grad(
                    compute_loss, has_aux=True
                )(live_sub)
                grads = {
                    **jax.tree.map(jnp.zeros_like, frozen_sub), **live_grads
                }
            else:
                (total, (parts, new_stats)), grads = jax.value_and_grad(
                    lambda p: loss_from(p, stats, mbatch), has_aux=True
                )(state.params)
            return new_stats, grads, total, parts

        if accum_steps > 1:
            b = batch["image"].shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"TRAIN.GRAD_ACCUM={accum_steps} must divide the batch "
                    f"size {b}")
            stacked = jax.tree.map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                    + x.shape[1:]),
                batch,
            )

            def body(stats, mbatch):
                new_stats, grads, total, parts = one_micro(stats, mbatch)
                return new_stats, (grads, total, parts)

            new_stats, (g_st, t_st, p_st) = jax.lax.scan(
                body, state.batch_stats, stacked)
            grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), g_st)
            total = jnp.mean(t_st)
            parts = jax.tree.map(lambda p: jnp.mean(p, axis=0), p_st)
        else:
            new_stats, grads, total, parts = one_micro(
                state.batch_stats, batch)

        # inject the LR into the optimizer hyperparams
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        state = state.replace(opt_state=opt_state)
        state = state.apply_gradients(
            grads, update_mask=mask_backbone_grads if freeze_backbone else None
        )
        state = state.replace(batch_stats=new_stats)

        metrics = dict(parts)
        metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    return train_step


def make_eval_step(model, loss_fn=None, decode_fn=None) -> Callable:
    """Build the jittable eval step: forward (+ loss) (+ decode)."""

    def eval_step(state: TrainState, batch: Dict[str, Any]):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"],
            batch.get("pc_hm"),
            batch.get("pc_dep"),
            batch.get("calib"),
            train=False,
        )
        ret = {}
        if loss_fn is not None:
            ret["loss"], ret["loss_parts"] = loss_fn(outputs, batch, train=False)
        if decode_fn is not None:
            ret["detections"] = decode_fn(outputs)
        ret["outputs"] = outputs
        return ret

    return eval_step
