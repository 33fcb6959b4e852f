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


def _mcts_policy_fn(runner, config, variables):
    spec = mcts_ops.SearchSpec.from_config(config)

    @jax.jit
    def search(obs, legal, to_play, rng):
        return mcts_ops.run_mcts(
            lambda o: runner.initial_inference(variables, o),
            lambda h, a: runner.recurrent_inference(variables, h, a),
            obs, legal, to_play, rng, spec, add_exploration_noise=True,
        )

    return search


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

    rng, k = jax.random.split(rng)
    state = env.reset(k)
    obs_list = [np.asarray(env.observation(state))]
    actions, rewards, to_plays = [0], [0.0], [int(env.to_play(state))]
    child_visits, root_values = [], []
    done = False

    if render:
        env.render(state)

    while not done and len(actions) <= config.max_moves:
        observations = np.stack(obs_list)
        stacked = stack_observations_np(
            observations, np.asarray(actions, np.int64), len(obs_list) - 1, n, A
        )[None]
        legal = np.asarray(env.legal_actions_mask(state))[None]
        to_play = int(env.to_play(state))

        if opponent == "self" or to_play == muzero_player or len(config.players) == 1:
            rng, k = jax.random.split(rng)
            out = search(
                jnp.asarray(stacked), jnp.asarray(legal),
                jnp.full((1,), to_play, jnp.int32), k,
            )
            visits = np.asarray(out.root_visit_counts[0])
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
                action = int(env.expert_action(state, k))
            elif opponent == "human":
                action = int(env.human_to_action(state))
            else:
                raise NotImplementedError(
                    '"opponent" argument should be "self", "human", "expert" or "random"'
                )
            child_visits.append(np.zeros(A, np.float32))
            root_values.append(0.0)

        rng, k = jax.random.split(rng)
        state, reward, done = env.step(state, jnp.int32(action), k)
        done = bool(done)
        if render:
            print(f"Played action: {env.action_to_string(action)}")
            env.render(state)

        obs_list.append(np.asarray(env.observation(state)))
        actions.append(action)
        rewards.append(float(reward))
        to_plays.append(int(env.to_play(state)))

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
    rng = jax.random.PRNGKey(seed)
    rng, k = jax.random.split(rng)
    state = env.reset(k)
    env.render(state)
    done = False
    total = 0.0
    while not done:
        action = env.human_to_action(state)
        rng, k = jax.random.split(rng)
        state, reward, done = env.step(state, jnp.int32(action), k)
        total += float(reward)
        print(f"Reward: {float(reward)}")
        env.render(state)
    print(f"Total reward: {total}")
