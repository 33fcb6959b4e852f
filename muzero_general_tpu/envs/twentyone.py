"""Jittable simplified Blackjack (reference games/twentyone.py:228-308).

Stochastic dealer via explicit PRNG keys threaded through state — the
vmapped-self-play stochastic-env seam called out in SURVEY.md §7. Card value
= min(randint(1, 12), 10); dealer draws to >16 when the episode ends; reward
{+10, 0, -10} (reference Game wrapper scales *10, twentyone.py:156).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from muzero_general_tpu.envs.core import JaxEnv


def _card(key):
    card = jax.random.randint(key, (), 1, 13)
    return jnp.minimum(card, 10).astype(jnp.int32)


class TwentyOneState(NamedTuple):
    player_hand: jnp.ndarray  # int32
    dealer_hand: jnp.ndarray  # int32
    done: jnp.ndarray  # bool


class TwentyOne(JaxEnv):
    observation_shape = (3, 3, 3)
    num_actions = 2  # 0 = Hit, 1 = Stand
    num_players = 1

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        return TwentyOneState(_card(k1), _card(k2), jnp.bool_(False))

    def observation(self, state):
        return jnp.stack(
            [
                jnp.full((3, 3), state.player_hand, jnp.float32),
                jnp.full((3, 3), state.dealer_hand, jnp.float32),
                jnp.zeros((3, 3), jnp.float32),
            ]
        )

    def step(self, state, action, key):
        k_hit, k_dealer = jax.random.split(key)
        player = jnp.where(
            (action == 0) & ~state.done, state.player_hand + _card(k_hit),
            state.player_hand,
        )
        done_now = (player > 21) | (action == 1) | (player == 21)

        # Dealer draws to >16 unless the player busted (twentyone.py:295-299)
        def dealer_cond(carry):
            hand, k = carry
            return hand <= 16

        def dealer_body(carry):
            hand, k = carry
            k, sub = jax.random.split(k)
            return hand + _card(sub), k

        dealer_final, _ = jax.lax.while_loop(
            dealer_cond, dealer_body, (state.dealer_hand, k_dealer)
        )
        dealer = jnp.where(done_now & (player <= 21), dealer_final, state.dealer_hand)

        # Reward table (twentyone.py:275-285), *10 (Game wrapper :156)
        win = (player <= 21) & ((dealer < player) | (dealer > 21))
        bust = player > 21
        push = (player <= 21) & (dealer == player)
        raw = jnp.where(win, 1.0, jnp.where(bust, -1.0, jnp.where(push, 0.0, -1.0)))
        reward = jnp.where(done_now & ~state.done, raw * 10.0, 0.0)

        new_state = TwentyOneState(player, dealer, state.done | done_now)
        return new_state, reward, new_state.done

    def action_to_string(self, action):
        return f"{action}. {['Hit', 'Stand'][int(action)]}"

    def render(self, state):
        print(f"Dealer hand: {int(state.dealer_hand)}")
        print(f"Player hand: {int(state.player_hand)}")
