"""Learner: one jitted train step with scanned unroll.

Re-design of reference trainer.py (Trainer.update_weights :124-273,
update_lr :275-283, loss_function :285-300) as a pure function:

- the Python list of per-step predictions becomes a `lax.scan` over the
  unroll (memory stays flat, XLA fuses the whole step);
- torch backward hooks become stop-gradient algebra with identical
  semantics: the ×0.5 hidden-state hook (trainer.py:178) scales the total
  gradient at the normalized hidden state — covering both the prediction
  heads and the next dynamics step, but not the reward head (which branches
  off pre-normalization) — and the ÷gradient_scale per-step loss hooks
  (trainer.py:225-233) scale gradients while preserving forward values, so
  logged losses match the reference's exactly;
- torch Adam/SGD L2 weight decay becomes optax add_decayed_weights placed
  *before* the moment transform (same update rule);
- the exponential lr schedule lr_init * rate^(step/steps) is optax
  exponential_decay (trainer.py:279-281).

Returns per-position priorities |decoded value − scalar target|^PER_alpha
(trainer.py:196-207, :239-250) for the PER write-back.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from muzero_general_tpu.ops.support import scalar_to_support, support_to_scalar


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any  # {} for networks without batch norm
    opt_state: Any
    step: jnp.ndarray  # int32


def scale_gradient(x, scale):
    """Forward-identity, gradient scaled by `scale` (may be per-sample)."""
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


def cross_entropy(logits, target_probs):
    """(-target * log_softmax(logits)).sum(-1) (reference trainer.py:285-300)."""
    return -jnp.sum(target_probs * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def lr_schedule(config):
    return optax.exponential_decay(
        init_value=config.lr_init,
        transition_steps=config.lr_decay_steps,
        decay_rate=config.lr_decay_rate,
    )


def make_optimizer(config):
    """torch-equivalent Adam/SGD chains (reference trainer.py:37-53)."""
    schedule = lr_schedule(config)
    if config.optimizer == "Adam":
        return optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.scale_by_adam(eps=1e-8),
            optax.scale_by_learning_rate(schedule),
        )
    elif config.optimizer == "SGD":
        return optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.trace(decay=config.momentum),
            optax.scale_by_learning_rate(schedule),
        )
    raise NotImplementedError(f"{config.optimizer} is not implemented.")


def init_train_state(runner, config, rng) -> TrainState:
    variables = runner.init(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.int32(0),
    )


def make_train_step(runner, config, donate=True, jit=True):
    """Build the train_step(state, batch) function (jitted unless jit=False —
    the raw function is used by parallel.mesh to re-jit with shardings)."""
    module = runner.module
    tx = make_optimizer(config)
    schedule = lr_schedule(config)
    S = config.support_size
    alpha = config.PER_alpha
    vw = config.value_loss_weight
    use_per = config.PER

    def apply_train(params, batch_stats, method, *args):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            out, mut = module.apply(
                variables, *args, train=True, method=method, mutable=["batch_stats"]
            )
            return out, mut["batch_stats"]
        return module.apply(variables, *args, train=True, method=method), batch_stats

    def loss_fn(params, batch_stats, batch):
        obs = batch["observation"]  # [B, C', H, W]
        actions = batch["action"]  # [B, U+1]
        target_value = batch["target_value"]  # [B, U+1] scalar
        target_reward = batch["target_reward"]
        target_policy = batch["target_policy"]  # [B, U+1, A]
        weights = batch["weight"]  # [B]
        grad_scale = batch["gradient_scale"]  # [B, U+1]

        tv_support = scalar_to_support(target_value, S)  # [B, U+1, bins]
        tr_support = scalar_to_support(target_reward, S)

        # ---- step 0: initial inference; reward loss ignored --------------
        hidden, batch_stats = apply_train(
            params, batch_stats, module.representation, obs
        )
        (policy_logits, value_logits), batch_stats = apply_train(
            params, batch_stats, module.prediction, hidden
        )
        value_loss = cross_entropy(value_logits, tv_support[:, 0])
        policy_loss = cross_entropy(policy_logits, target_policy[:, 0])
        reward_loss = jnp.zeros_like(value_loss)
        pr0 = (
            jnp.abs(
                support_to_scalar(jax.lax.stop_gradient(value_logits), S)
                - target_value[:, 0]
            )
            ** alpha
        )

        # ---- steps 1..U: scanned dynamics unroll -------------------------
        def unroll_body(carry, xs):
            hidden, batch_stats = carry
            action, tv_s, tv_scalar, tr_s, tp, gs = xs
            (hidden_new, reward_logits), batch_stats = apply_train(
                params, batch_stats, module.dynamics, hidden, action
            )
            # ×0.5 total-gradient hook at the normalized hidden state
            # (reference trainer.py:178): covers prediction heads + next
            # dynamics input; the reward head branched off pre-normalization.
            hidden_new = scale_gradient(hidden_new, 0.5)
            (policy_logits, value_logits), batch_stats = apply_train(
                params, batch_stats, module.prediction, hidden_new
            )
            inv = 1.0 / jnp.maximum(gs, 1.0)
            vl = scale_gradient(cross_entropy(value_logits, tv_s), inv)
            rl = scale_gradient(cross_entropy(reward_logits, tr_s), inv)
            pl = scale_gradient(cross_entropy(policy_logits, tp), inv)
            pr = (
                jnp.abs(
                    support_to_scalar(jax.lax.stop_gradient(value_logits), S)
                    - tv_scalar
                )
                ** alpha
            )
            return (hidden_new, batch_stats), (vl, rl, pl, pr)

        U = actions.shape[1] - 1
        if getattr(config, "remat_unroll", True):
            # Rematerialize each unroll step: without this the scan stores
            # every conv/BN residual of U dynamics+prediction forwards and
            # atari-class shapes OOM HBM at batch >=512 (RESULTS r4 train
            # lane). prevent_cse=False is the documented setting for
            # checkpoint-inside-scan (the scan body is staged once; CSE
            # protection only costs compile time).
            unroll_body = jax.checkpoint(unroll_body, prevent_cse=False)
        xs = (
            jnp.moveaxis(actions[:, 1:], 1, 0),
            jnp.moveaxis(tv_support[:, 1:], 1, 0),
            jnp.moveaxis(target_value[:, 1:], 1, 0),
            jnp.moveaxis(tr_support[:, 1:], 1, 0),
            jnp.moveaxis(target_policy[:, 1:], 1, 0),
            jnp.moveaxis(grad_scale[:, 1:], 1, 0),
        )
        (_, batch_stats), (vls, rls, pls, prs) = jax.lax.scan(
            unroll_body, (hidden, batch_stats), xs, length=U
        )
        value_loss = value_loss + jnp.sum(vls, axis=0)
        reward_loss = reward_loss + jnp.sum(rls, axis=0)
        policy_loss = policy_loss + jnp.sum(pls, axis=0)

        loss = value_loss * vw + reward_loss + policy_loss
        if use_per:
            # IS-weight PER bias correction (reference trainer.py:254-256)
            loss = loss * weights
        loss = jnp.mean(loss)

        priorities = jnp.concatenate(
            [pr0[:, None], jnp.moveaxis(prs, 0, 1)], axis=1
        )  # [B, U+1]
        metrics = {
            "total_loss": loss,
            "value_loss": jnp.mean(value_loss),
            "reward_loss": jnp.mean(reward_loss),
            "policy_loss": jnp.mean(policy_loss),
        }
        return loss, (batch_stats, metrics, priorities)

    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (batch_stats, metrics, priorities)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["lr"] = schedule(state.step)
        new_state = TrainState(params, batch_stats, opt_state, state.step + 1)
        return new_state, metrics, priorities

    if not jit:
        return train_step
    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)


def make_fused_train_steps(runner, config, donate=True, jit=True):
    """Train M batches in ONE dispatch: lax.scan of the train step.

    Amortizes host->device dispatch latency (decisive when the chip sits
    behind a network tunnel). batches: dict of arrays with leading axis M.
    Returns (state, metrics of the LAST step, priorities [M, B, U+1]).
    jit=False returns the raw function (re-jitted by parallel.mesh with
    mesh-placed operands).
    """
    step = make_train_step(runner, config, jit=False)

    def train_steps(state, batches):
        def body(state, batch):
            state, metrics, priorities = step(state, batch)
            return state, (metrics, priorities)

        state, (metrics, priorities) = jax.lax.scan(body, state, batches)
        last_metrics = {k: v[-1] for k, v in metrics.items()}
        return state, last_metrics, priorities

    if not jit:
        return train_steps
    if donate:
        return jax.jit(train_steps, donate_argnums=(0,))
    return jax.jit(train_steps)
