"""Standalone SSL pretraining phase (reference train.py:292-499).

Each epoch: shuffle the collected random-policy states, run minibatch SGD of
the SSL loss over a SEPARATE Adam (the reference builds a dedicated
``SSL_optimizer`` over the representation parameters, train.py:334), BYOL
EMA per minibatch, then an evaluation pass on the held-out set. The whole
epoch (train + eval) is one jitted program with `lax.scan` minibatches.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from eavit_tpu.config import Config
from eavit_tpu.rl.agent import AgentState, RNDAgent


class SSLPretrainer:
    def __init__(self, cfg: Config, agent: RNDAgent):
        assert agent.ssl is not None, "SSL pretraining needs an SSL method"
        self.cfg = cfg
        self.agent = agent
        self.tx = optax.adam(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
        self._epoch = jax.jit(self._epoch_impl, donate_argnums=(0, 1))

    def init_opt(self, state: AgentState):
        sub = {"feature": state.params["policy"]["feature"],
               "ssl": state.params["ssl"]}
        return self.tx.init(sub)

    def epoch(self, state, opt_state, train_states_u8, eval_states_u8, rng):
        return self._epoch(state, opt_state, train_states_u8, eval_states_u8, rng)

    def _epoch_impl(self, state: AgentState, opt_state, train_u8, eval_u8, rng):
        cfg = self.cfg
        ssl = self.agent.ssl
        m = train_u8.shape[0]
        batch_size = cfg.batch_size
        num_batches = max(1, m // batch_size)

        def loss_fn(sub, ssl_target, batch, key):
            params = {
                "policy": {**state.params["policy"], "feature": sub["feature"]},
                "ssl": sub["ssl"],
            }
            return ssl.loss(params, ssl_target, batch, key)

        grad_fn = jax.value_and_grad(loss_fn)

        def mb(carry, xs):
            sub, opt_state, ssl_target = carry
            idx, key = xs
            loss, grads = grad_fn(sub, ssl_target, train_u8[idx], key)
            updates, opt_state = self.tx.update(grads, opt_state, sub)
            sub = optax.apply_updates(sub, updates)
            params = {
                "policy": {**state.params["policy"], "feature": sub["feature"]},
                "ssl": sub["ssl"],
            }
            ssl_target = ssl.update_target(params, ssl_target)
            return (sub, opt_state, ssl_target), loss

        k_perm, k_mb, k_eval = jax.random.split(rng, 3)
        perm = jax.random.permutation(k_perm, m)[: num_batches * batch_size]
        idxs = perm.reshape(num_batches, batch_size)
        keys = jax.random.split(k_mb, num_batches)
        sub0 = {"feature": state.params["policy"]["feature"],
                "ssl": state.params["ssl"]}
        (sub, opt_state, ssl_target), losses = jax.lax.scan(
            mb, (sub0, opt_state, state.ssl_target), (idxs, keys)
        )

        new_params = {
            **state.params,
            "policy": {**state.params["policy"], "feature": sub["feature"]},
            "ssl": sub["ssl"],
        }

        # evaluation pass (no grads)
        me = eval_u8.shape[0]
        num_eval = max(1, me // batch_size)
        eval_keys = jax.random.split(k_eval, num_eval)

        def eb(_, xs):
            i, key = xs
            batch = jax.lax.dynamic_slice_in_dim(eval_u8, i * batch_size, batch_size)
            return None, ssl.loss(new_params, ssl_target, batch, key)

        _, eval_losses = jax.lax.scan(
            eb, None, (jnp.arange(num_eval), eval_keys)
        )

        new_state = state._replace(params=new_params, ssl_target=ssl_target)
        return new_state, opt_state, jnp.mean(losses), jnp.mean(eval_losses)


def make_ssl_pretrainer(cfg: Config, agent: RNDAgent) -> SSLPretrainer:
    return SSLPretrainer(cfg, agent)
