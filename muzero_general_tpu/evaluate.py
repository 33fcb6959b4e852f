"""Host-side single-game evaluation against scripted opponents.

Counterpart of the reference's test path with opponent modes
(reference muzero.py:369-424 test, self_play.py:188-220
select_opponent_action): "self", "random", "expert", "human". The MuZero
turns run the batched MCTS with batch 1 on device; opponent turns are host
logic, so this path also works for envs whose expert agents are host code.
"""

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu.ops import mcts as mcts_ops
from muzero_general_tpu.ops.stacking import stack_observations_np
from muzero_general_tpu.replay import GameHistory


_search_cache = {}


def _mcts_policy_fn(runner, config, variables):
    """B=1 search closure; the jitted core is cached per (runner, sims) so
    repeated evaluations don't re-trace."""
    if getattr(config, "use_gumbel_mcts", False):
        from muzero_general_tpu.ops import gumbel as gumbel_ops

        gspec = gumbel_ops.GumbelSpec.from_config(config)
        key = (id(runner), gspec)
        if key not in _search_cache:

            @jax.jit
            def search_core(variables, obs, legal, to_play, rng):
                # Deterministic greedy Gumbel search for evaluation.
                return gumbel_ops.run_gumbel_mcts(
                    lambda o: runner.initial_inference(variables, o),
                    lambda h, a: runner.recurrent_inference(variables, h, a),
                    obs, legal, to_play, rng, gspec, add_gumbel=False,
                )

            _search_cache[key] = search_core
    else:
        # batch_size=1: the block gate turns the Pallas kernels off for the
        # batch-1 eval search (blocks need >= 8 lanes; Mosaic also miscompiles
        # [1, A] planar operands — r4 gate crash) — the XLA path wins at B=1.
        spec = mcts_ops.SearchSpec.from_config(config, batch_size=1)
        key = (id(runner), spec)
        if key not in _search_cache:

            @jax.jit
            def search_core(variables, obs, legal, to_play, rng):
                return mcts_ops.run_mcts(
                    lambda o: runner.initial_inference(variables, o),
                    lambda h, a: runner.recurrent_inference(variables, h, a),
                    obs, legal, to_play, rng, spec, add_exploration_noise=True,
                )

            _search_cache[key] = search_core
    core = _search_cache[key]
    return lambda obs, legal, to_play, rng: core(variables, obs, legal, to_play, rng)


def play_against_opponent(env, runner, config, variables, opponent, muzero_player,
                          seed=0, render=False):
    """Play one game; MuZero moves on its turns, `opponent` otherwise.

    Returns a GameHistory (same aggregation contract as reference test()).
    """
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)
    search = _mcts_policy_fn(runner, config, variables)
    A = env.num_actions
    n = config.stacked_observations
    is_host = getattr(env, "host_env", False)

    rng, k = jax.random.split(rng)
    if is_host:
        obs0 = env.reset()

        class _H:  # uniform accessors over both env protocols
            legal = staticmethod(lambda: np.asarray(env.legal_actions_mask()))
            to_play = staticmethod(lambda: int(env.to_play()))
            render = staticmethod(lambda: env.render())

            @staticmethod
            def step(a, key):
                return env.step(a)

            @staticmethod
            def expert(key):
                return env.expert_action(np_rng)

            @staticmethod
            def human():
                return int(input(f"Enter action (0-{A - 1}): "))

        acc = _H
    else:
        _state = [env.reset(k)]
        obs0 = np.asarray(env.observation(_state[0]))

        class _J:
            legal = staticmethod(
                lambda: np.asarray(env.legal_actions_mask(_state[0]))
            )
            to_play = staticmethod(lambda: int(env.to_play(_state[0])))
            render = staticmethod(lambda: env.render(_state[0]))

            @staticmethod
            def step(a, key):
                s, r, d = env.step(_state[0], jnp.int32(a), key)
                _state[0] = s
                return np.asarray(env.observation(s)), float(r), bool(d)

            @staticmethod
            def expert(key):
                return int(env.expert_action(_state[0], key))

            @staticmethod
            def human():
                return int(env.human_to_action(_state[0]))

        acc = _J

    obs_list = [np.asarray(obs0)]
    actions, rewards, to_plays = [0], [0.0], [acc.to_play()]
    child_visits, root_values = [], []
    done = False

    if render:
        acc.render()

    while not done and len(actions) <= config.max_moves:
        observations = np.stack(obs_list)
        stacked = stack_observations_np(
            observations, np.asarray(actions, np.int64), len(obs_list) - 1, n, A
        )[None]
        legal = acc.legal()[None]
        to_play = acc.to_play()

        if opponent == "self" or to_play == muzero_player or len(config.players) == 1:
            rng, k = jax.random.split(rng)
            out = search(
                jnp.asarray(stacked), jnp.asarray(legal),
                jnp.full((1,), to_play, jnp.int32), k,
            )
            visits = np.asarray(out.root_visit_counts[0])
            if hasattr(out, "greedy_action"):  # Gumbel search output
                action = int(out.greedy_action[0])
            else:
                action = int(np.argmax(np.where(legal[0], visits, -1)))
            child_visits.append(visits / max(1, visits.sum()))
            root_values.append(float(out.root_value[0]))
            if render:
                print(f"Tree depth: {int(out.max_tree_depth[0])}")
                print(f"Root value for player {to_play}: {float(out.root_value[0]):.2f}")
        else:
            if opponent == "random":
                legal_idx = np.flatnonzero(legal[0])
                action = int(np_rng.choice(legal_idx))
            elif opponent == "expert":
                rng, k = jax.random.split(rng)
                action = int(acc.expert(k))
            elif opponent == "human":
                action = acc.human()
            else:
                raise NotImplementedError(
                    '"opponent" argument should be "self", "human", "expert" or "random"'
                )
            child_visits.append(np.zeros(A, np.float32))
            root_values.append(0.0)

        rng, k = jax.random.split(rng)
        obs, reward, done = acc.step(action, k)
        done = bool(done)
        if render:
            print(f"Played action: {env.action_to_string(action)}")
            acc.render()

        obs_list.append(np.asarray(obs))
        actions.append(action)
        rewards.append(float(reward))
        to_plays.append(acc.to_play())

    return GameHistory(
        observations=np.stack(obs_list[:-1]).astype(np.float32),
        actions=np.asarray(actions, np.int32),
        rewards=np.asarray(rewards, np.float32),
        to_play=np.asarray(to_plays, np.int32),
        child_visits=np.stack(child_visits).astype(np.float32),
        root_values=np.asarray(root_values, np.float32),
    )


def manual_game(env, seed=0):
    """Play the env by hand (reference CLI menu 'Test the game manually')."""
    total = 0.0
    if getattr(env, "host_env", False):
        env.reset()
        env.render()
        done = False
        while not done:
            action = int(input(f"Enter action (0-{env.num_actions - 1}): "))
            _, reward, done = env.step(action)
            total += float(reward)
            print(f"Reward: {float(reward)}")
            env.render()
    else:
        rng = jax.random.PRNGKey(seed)
        rng, k = jax.random.split(rng)
        state = env.reset(k)
        env.render(state)
        done = False
        while not done:
            action = env.human_to_action(state)
            rng, k = jax.random.split(rng)
            state, reward, done = env.step(state, jnp.int32(action), k)
            total += float(reward)
            print(f"Reward: {float(reward)}")
            env.render(state)
    print(f"Total reward: {total}")
