"""Network factory and pure-function runner.

`MuZeroNetwork(config)` dispatches on `config.network` like reference
models.py:7-41, but returns a `NetworkRunner`: a thin stateless wrapper whose
methods are pure functions of (variables, inputs), ready for jit/vmap/pjit.
Weights are flax variable pytrees ({'params', 'batch_stats'}), the TPU-native
counterpart of the reference's CPU state-dict weight exchange
(reference models.py:69-73).
"""

import jax
import jax.numpy as jnp

from muzero_general_tpu.models.fc import FCMuZero
from muzero_general_tpu.models.resnet import ResMuZero

_BN_EPS = 1e-5  # flax nn.BatchNorm default epsilon


def fold_bn_variables(variables):
    """Fold batch norms into their preceding convolutions (inference only).

    Maps the trained ResMuZero variables ({'params', 'batch_stats'}) onto
    the parameter tree of the fold_bn=True module variant: at every scope,
    TorchConv_i paired with sibling BatchNorm_i becomes a biased conv with
      kernel' = kernel * s,   bias' = beta - mean * s,
      s = gamma * rsqrt(var + eps)   (per output channel),
    and the BatchNorm entries disappear. y = conv'(x) equals
    bn(conv(x)) up to float reassociation; the search path then runs one
    conv + relu per layer with no separate normalization pass.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fold_scope(p_scope, s_scope):
        out = {}
        for name, sub in p_scope.items():
            if name.startswith("BatchNorm_"):
                continue  # consumed by its paired conv below
            if name.startswith("TorchConv_"):
                idx = name.split("_", 1)[1]
                bn = p_scope.get(f"BatchNorm_{idx}")
                if bn is not None:
                    st = s_scope[f"BatchNorm_{idx}"]
                    s = bn["scale"] * jax.lax.rsqrt(st["var"] + _BN_EPS)
                    kernel = sub["kernel"] * s  # [kh, kw, in, out] * [out]
                    bias = bn["bias"] - st["mean"] * s
                    if "bias" in sub:
                        bias = bias + sub["bias"] * s
                    out[name] = {"kernel": kernel, "bias": bias}
                    continue
                out[name] = sub
                continue
            if (
                isinstance(sub, dict)
                and sub
                and all(isinstance(v, dict) for v in sub.values())
            ):
                # Submodule scope (flax scopes contain only dicts; leaf
                # param dicts like TorchDense's {'kernel','bias'} contain
                # only arrays and are copied unchanged below).
                out[name] = fold_scope(dict(sub), dict(s_scope.get(name, {})))
            else:
                out[name] = sub
        return out

    return {"params": fold_scope(dict(params), dict(stats))}


class NetworkRunner:
    """Stateless apply-wrapper around a MuZero flax module."""

    def __init__(self, module, config):
        self.module = module
        self.config = config
        # Inference-only BN-folded twin (ResNet only): same architecture
        # with fold_bn=True; apply with fold_bn_variables(variables).
        # config.search_bf16_activations additionally runs its conv
        # pipeline + hidden states in bf16 (bandwidth; heads stay f32).
        self.folded_module = (
            module.clone(
                fold_bn=True,
                act_dtype=(
                    jnp.bfloat16
                    if getattr(config, "search_bf16_activations", False)
                    else jnp.float32
                ),
            )
            if isinstance(module, ResMuZero)
            else None
        )

    # -- init ------------------------------------------------------------
    def stacked_observation_shape(self):
        c, h, w = self.config.observation_shape
        n = self.config.stacked_observations
        return (c * (n + 1) + n, h, w)

    def init(self, rng) -> dict:
        obs = jnp.zeros((1,) + self.stacked_observation_shape(), jnp.float32)
        action = jnp.zeros((1,), jnp.int32)
        return self.module.init(rng, obs, action, train=False)

    # -- inference (eval mode: BN running stats) -------------------------
    def initial_inference(self, variables, observation):
        """[B, C', H, W] -> (value_logits, reward_logits, policy_logits, hidden)."""
        return self.module.apply(
            variables, observation, train=False, method=self.module.initial_inference
        )

    def recurrent_inference(self, variables, hidden, action):
        return self.module.apply(
            variables,
            hidden,
            action,
            train=False,
            method=self.module.recurrent_inference,
        )

    # -- BN-folded inference (ResNet search path) ------------------------
    def fold_variables(self, variables):
        """Trained variables -> folded-variant variables (fold_bn_variables)."""
        return fold_bn_variables(variables)

    def initial_inference_folded(self, folded_variables, observation):
        return self.folded_module.apply(
            folded_variables, observation, train=False,
            method=self.folded_module.initial_inference,
        )

    def recurrent_inference_folded(self, folded_variables, hidden, action):
        return self.folded_module.apply(
            folded_variables, hidden, action, train=False,
            method=self.folded_module.recurrent_inference,
        )

    # -- training mode (mutates batch_stats) -----------------------------
    def initial_inference_train(self, variables, observation):
        """Returns ((value, reward, policy, hidden), new_batch_stats_dict)."""
        return self.module.apply(
            variables,
            observation,
            train=True,
            method=self.module.initial_inference,
            mutable=["batch_stats"],
        )

    def recurrent_inference_train(self, variables, hidden, action):
        return self.module.apply(
            variables,
            hidden,
            action,
            train=True,
            method=self.module.recurrent_inference,
            mutable=["batch_stats"],
        )

    def num_params(self, variables) -> int:
        return sum(
            x.size for x in jax.tree_util.tree_leaves(variables.get("params", {}))
        )


class MuZeroNetwork:
    """Factory: dispatch on config.network (reference models.py:7-41)."""

    def __new__(cls, config) -> NetworkRunner:
        dtype = (
            jnp.bfloat16
            if getattr(config, "compute_dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        if config.network == "fullyconnected":
            module = FCMuZero(
                observation_shape=tuple(config.observation_shape),
                stacked_observations=config.stacked_observations,
                action_space_size=len(config.action_space),
                encoding_size=config.encoding_size,
                fc_reward_layers=tuple(config.fc_reward_layers),
                fc_value_layers=tuple(config.fc_value_layers),
                fc_policy_layers=tuple(config.fc_policy_layers),
                fc_representation_layers=tuple(config.fc_representation_layers),
                fc_dynamics_layers=tuple(config.fc_dynamics_layers),
                support_size=config.support_size,
                dtype=dtype,
            )
        elif config.network == "resnet":
            module = ResMuZero(
                observation_shape=tuple(config.observation_shape),
                stacked_observations=config.stacked_observations,
                action_space_size=len(config.action_space),
                num_blocks=config.blocks,
                num_channels=config.channels,
                reduced_channels_reward=config.reduced_channels_reward,
                reduced_channels_value=config.reduced_channels_value,
                reduced_channels_policy=config.reduced_channels_policy,
                fc_reward_layers=tuple(config.resnet_fc_reward_layers),
                fc_value_layers=tuple(config.resnet_fc_value_layers),
                fc_policy_layers=tuple(config.resnet_fc_policy_layers),
                support_size=config.support_size,
                downsample=config.downsample,
                dtype=dtype,
            )
        else:
            raise NotImplementedError(
                'The network parameter should be "fullyconnected" or "resnet".'
            )
        return NetworkRunner(module, config)
