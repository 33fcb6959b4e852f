"""Model diagnosis: virtual-vs-real trajectory comparison, seaborn heatmaps,
graphviz MCTS rendering.

Parity target: reference diagnose_model.py (DiagnoseModel :10-192,
Trajectoryinfo :195-370). The per-node Python tree the reference walks is
replaced by the batched search's SoA Tree arrays (ops/mcts.py), extracted at
batch index 0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from muzero_general_tpu.ops import mcts as mcts_ops
from muzero_general_tpu.ops.support import support_to_scalar


def _root_child_stats(tree, num_simulations):
    """Per-action (prior, visits, value, reward) of the root's children;
    NaN where the edge was never materialized (illegal at root)."""
    prior = np.asarray(tree.children_prior[0, 0])  # [A]
    visits = np.asarray(tree.children_visit[0, 0])
    vsum = np.asarray(tree.children_vsum[0, 0])
    reward = np.asarray(tree.children_reward[0, 0])
    value = np.where(visits > 0, vsum / np.maximum(visits, 1), 0.0)
    nan = np.nan
    legal = np.asarray(tree.root_legal[0])
    return {
        "prior": np.where(legal, prior, nan),
        "policy": np.where(legal, visits / num_simulations, nan),
        "value": np.where(legal, value, nan),
        "reward": np.where(legal, reward, nan),
    }


class Trajectoryinfo:
    """Reference diagnose_model.py:195-370 (same fields and plots)."""

    def __init__(self, title, config):
        self.title = title + ": "
        self.config = config
        self.action_history = []
        self.reward_history = []
        self.prior_policies = []
        self.policies_after_planning = []
        self.values_after_planning = [[np.nan] * len(config.action_space)]
        self.prior_root_value = []
        self.root_value_after_planning = []
        self.prior_rewards = [[np.nan] * len(config.action_space)]
        self.mcts_depth = []

    def store_info(self, out, action, reward, new_prior_root_value=None):
        stats = _root_child_stats(out.tree, self.config.num_simulations)
        if action is not None:
            self.action_history.append(int(action))
        if reward is not None:
            self.reward_history.append(float(reward))
        self.prior_policies.append(stats["prior"].tolist())
        self.policies_after_planning.append(stats["policy"].tolist())
        self.values_after_planning.append(stats["value"].tolist())
        self.prior_root_value.append(
            float(out.root_predicted_value[0])
            if not new_prior_root_value
            else float(new_prior_root_value)
        )
        self.root_value_after_planning.append(float(out.root_value[0]))
        self.prior_rewards.append(stats["reward"].tolist())
        self.mcts_depth.append(int(out.max_tree_depth[0]))

    def plot_trajectory(self, save_dir=None, show=True):
        import matplotlib

        if not show:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn

        def heat(name, data, ticks=True):
            data = np.array(data, dtype=np.float64)
            print(name, data.tolist(), "\n")
            plt.figure(self.title + name)
            ax = seaborn.heatmap(
                data, mask=np.isnan(data), annot=True,
                xticklabels=ticks,
            )
            ax.set(xlabel="Action" if data.shape[1] > 1 else None, ylabel="Timestep")
            ax.set_title(name)
            if save_dir is not None:
                plt.savefig(
                    f"{save_dir}/{self.title.strip(': ')}_{name}.png".replace(
                        " ", "_"
                    )
                )

        heat("Prior policies", self.prior_policies)
        heat("Policies after planning", self.policies_after_planning)
        if self.action_history:
            heat("Action history", np.transpose([self.action_history]), ticks=False)
        heat("Values after planning", self.values_after_planning)
        heat("Prior root value", np.transpose([self.prior_root_value]), ticks=False)
        heat(
            "Root value after planning",
            np.transpose([self.root_value_after_planning]),
            ticks=False,
        )
        heat("Prior rewards", self.prior_rewards)
        if self.reward_history:
            heat("Reward history", np.transpose([self.reward_history]), ticks=False)
        heat("MCTS depth", np.transpose([self.mcts_depth]), ticks=False)
        if show:
            plt.show(block=False)


class DiagnoseModel:
    def __init__(self, runner, config):
        self.runner = runner
        self.config = config
        # batch_size=1 gates the Pallas kernels off (diagnosis searches are
        # batch-1; see evaluate.py).
        self.spec = mcts_ops.SearchSpec.from_config(config, batch_size=1)
        self._rng = jax.random.PRNGKey(config.seed)

    def _search(self, variables, obs=None, legal=None, to_play=0, root_outputs=None):
        A = len(self.config.action_space)
        if legal is None:
            legal = np.ones((1, A), bool)
        self._rng, k = jax.random.split(self._rng)
        return mcts_ops.run_mcts(
            lambda o: self.runner.initial_inference(variables, o),
            lambda h, a: self.runner.recurrent_inference(variables, h, a),
            obs,
            jnp.asarray(legal),
            jnp.full((1,), to_play, jnp.int32),
            k,
            self.spec,
            add_exploration_noise=True,
            root_outputs=root_outputs,
        )

    def get_virtual_trajectory_from_obs(
        self, variables, observation, horizon, plot=True, to_play=0
    ):
        """Unroll the learned model only, MCTS at each virtual step
        (reference diagnose_model.py:31-80)."""
        trajectory_info = Trajectoryinfo("Virtual trajectory", self.config)
        out = self._search(variables, jnp.asarray(observation)[None], to_play=to_play)
        trajectory_info.store_info(out, None, np.nan)

        virtual_to_play = to_play
        P = len(self.config.players)
        for _ in range(horizon):
            visits = np.asarray(out.root_visit_counts[0])
            action = int(np.argmax(visits))
            virtual_to_play = (virtual_to_play + 1) % P

            root_hidden = out.root_hidden  # [1, ...] root hidden state
            value_l, reward_l, policy_l, hidden = self.runner.recurrent_inference(
                variables, root_hidden, jnp.full((1,), action, jnp.int32)
            )
            value = float(
                support_to_scalar(value_l, self.config.support_size)[0]
            )
            reward = float(
                support_to_scalar(reward_l, self.config.support_size)[0]
            )
            out = self._search(
                variables,
                to_play=virtual_to_play,
                root_outputs=(value_l, reward_l, policy_l, hidden),
            )
            trajectory_info.store_info(
                out, action, reward, new_prior_root_value=value
            )

        if plot:
            trajectory_info.plot_trajectory()
        return trajectory_info

    def compare_virtual_with_real_trajectories(
        self, variables, env, horizon, plot=True
    ):
        """Reference diagnose_model.py:82-140."""
        self._rng, k = jax.random.split(self._rng)
        if getattr(env, "host_env", False):
            obs0 = env.reset()
            legal_fn = lambda: np.asarray(env.legal_actions_mask())[None]
            to_play_fn = lambda: int(env.to_play())
            step_fn = lambda a: env.step(a)
        else:
            state = [env.reset(k)]
            obs0 = np.asarray(env.observation(state[0]))
            legal_fn = lambda: np.asarray(env.legal_actions_mask(state[0]))[None]
            to_play_fn = lambda: int(env.to_play(state[0]))

            def step_fn(a):
                s, r, d = env.step(state[0], jnp.int32(a), k)
                state[0] = s
                return np.asarray(env.observation(s)), float(r), bool(d)

        virtual = self.get_virtual_trajectory_from_obs(
            variables, obs0, horizon, False
        )
        real = Trajectoryinfo("Real trajectory", self.config)
        divergence_index = None
        end_reason = "Reached horizon"

        out = self._search(
            variables, jnp.asarray(obs0)[None], legal=legal_fn(),
            to_play=to_play_fn(),
        )
        self.plot_mcts(out.tree, plot)
        real.store_info(out, None, np.nan)
        for i, action in enumerate(virtual.action_history):
            if not legal_fn()[0][action]:
                end_reason = (
                    f"Virtual trajectory reached an illegal move at timestep {i}."
                )
                divergence_index = i
                break
            obs, reward, done = step_fn(action)
            out = self._search(
                variables, jnp.asarray(obs)[None], legal=legal_fn(),
                to_play=to_play_fn(),
            )
            real.store_info(out, action, reward)
            if done:
                end_reason = "Real trajectory reached Done"
                break

        if plot:
            virtual.plot_trajectory()
            real.plot_trajectory()
            print(end_reason)
        return virtual, real, divergence_index

    def close_all(self):
        import matplotlib.pyplot as plt

        plt.close("all")

    def plot_mcts(self, tree, plot=True, filename="mcts"):
        """Graphviz rendering of the search tree (reference
        diagnose_model.py:145-192), walked from the SoA arrays at batch 0."""
        try:
            from graphviz import Digraph
        except ModuleNotFoundError:
            print("Please install graphviz to get the MCTS plot.")
            return None

        children_index = np.asarray(tree.children_index[0])
        children_prior = np.asarray(tree.children_prior[0])
        children_visit = np.asarray(tree.children_visit[0])
        children_vsum = np.asarray(tree.children_vsum[0])
        children_reward = np.asarray(tree.children_reward[0])
        root_visit = int(tree.root_visit[0])
        root_vsum = float(tree.root_vsum[0])
        root_reward = float(tree.root_reward[0])

        graph = Digraph(comment="MCTS", engine="neato")
        graph.attr("graph", rankdir="LR", splines="true", overlap="false")
        counter = [0]

        def traverse(node, action, prior, visit, vsum, reward, parent_gid, best):
            # A node's stats are its incoming edge's (edge-array Tree,
            # ops/mcts.py); the root passes its explicit scalars.
            gid = counter[0]
            counter[0] += 1
            value = vsum / visit if visit else 0.0
            graph.node(
                str(gid),
                label=(
                    f"Action: {action}\nValue: {value:.2f}\n"
                    f"Visit count: {visit}\nPrior: {prior:.2f}\n"
                    f"Reward: {reward:.2f}"
                ),
                color="orange" if best else "black",
            )
            if parent_gid is not None:
                graph.edge(str(parent_gid), str(gid), constraint="false")
            kids = children_index[node]
            kid_visits = [
                children_visit[node][a]
                for a in range(len(kids))
                if kids[a] >= 0
            ]
            best_visits = max(kid_visits) if kid_visits else 0
            for a in range(len(kids)):
                if kids[a] >= 0 and children_visit[node][a] != 0:
                    traverse(
                        kids[a], a, children_prior[node][a],
                        int(children_visit[node][a]),
                        float(children_vsum[node][a]),
                        float(children_reward[node][a]),
                        gid,
                        best_visits and children_visit[node][a] == best_visits,
                    )

        traverse(0, None, 0.0, root_visit, root_vsum, root_reward, None, True)
        graph.node(str(0), color="red")
        try:
            graph.render(filename, view=plot, cleanup=True, format="pdf")
        except Exception as e:  # dot binary may be missing
            with open(f"{filename}.gv", "w") as f:
                f.write(graph.source)
            print(f"graphviz render failed ({e}); DOT source saved to {filename}.gv")
        return graph
