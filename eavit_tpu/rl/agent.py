"""The RND/PPO agent: functional state + jitted act / intrinsic / update.

Reference counterpart: ``RNDAgent`` (agents.py:30-624) plus the per-update
host-side math in train.py:580-870. The TPU redesign collapses all of it
into three compiled programs:

- :meth:`RNDAgent.act` — policy forward + sampling, one call per env step.
- :meth:`RNDAgent.update` — EVERYTHING between two rollouts: reward clip,
  RND intrinsic rewards, RewardForwardFilter + reward-RMS normalization,
  dual GAE (episodic extrinsic / non-episodic intrinsic), advantage mixing,
  obs-RMS update, and the full ``Epoch x MiniBatch`` PPO/RND SGD loop as
  nested `lax.scan`s. One H2D transfer per rollout; no host round-trips.
- :meth:`RNDAgent.update_obs_rms` — the obs-normalization warm-up
  (reference train.py:502-569).

Reference-faithful ordering preserved: intrinsic rewards are computed with
the PRE-update obs_rms; the RND training input is normalized with the
POST-update obs_rms (reference train.py:662-673 vs 772-779, 853-861).

Documented fix vs reference: with ``axis_name`` set (data-parallel mesh),
gradients are ``pmean``-ed and normalizer statistics are pooled with
``psum`` — the reference never syncs its RMS objects across DDP ranks.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eavit_tpu.config import Config, RepresentationMethod, TrainMethod
from eavit_tpu.models.policy import ActionSpaceType, ActorCritic
from eavit_tpu.models.rnd import RNDPredictor, RNDTarget, intrinsic_reward, rnd_loss
from eavit_tpu.ops.gae import make_train_data
from eavit_tpu.rl import normalizer as norm
from eavit_tpu.rl.ppo import (
    categorical_entropy,
    categorical_log_prob,
    global_grad_norm,
    normal_entropy,
    normal_log_prob,
    ppo_surrogate,
    sample_categorical,
    sample_normal,
)


# global_step is stored as a [hi, lo] int32 pair in base 2**30 so a
# week-long flagship run cannot overflow (a single int32 wraps at ~262k
# updates x 8,192 frames; jax has no int64 without global x64 mode)
GLOBAL_STEP_BASE = 1 << 30


def global_step_value(state: "AgentState") -> int:
    """Total env frames consumed, as a Python int (overflow-free)."""
    hi_lo = np.asarray(state.global_step)
    return int(hi_lo[0]) * GLOBAL_STEP_BASE + int(hi_lo[1])


class AgentState(NamedTuple):
    """All mutable agent state as one pytree (device-resident)."""

    params: Any  # {"policy": ..., "rnd_pred": ...?, "ssl": ...?}
    rnd_target: Any  # frozen target params (None in PPO mode)
    ssl_target: Any  # BYOL EMA target params (None unless BYOL)
    opt_state: Any
    obs_rms: Any  # RMSState or None (PPO mode)
    reward_rms: norm.RMSState
    reward_filter: norm.RewardFilterState
    global_step: jnp.ndarray  # [hi, lo] i32 pair, base 2**30
    global_update: jnp.ndarray


class Rollout(NamedTuple):
    """One n-step rollout, time-major [T, N, ...] (uint8 frames)."""

    states: jnp.ndarray  # [T, N, C, H, W] uint8
    actions: jnp.ndarray  # [T, N] i32 (discrete) | [T, N, A] f32
    rewards: jnp.ndarray  # [T, N] f32 raw env rewards
    dones: jnp.ndarray  # [T, N] bool
    next_obs: jnp.ndarray  # [T, N, 1|C, H, W] uint8 (RND input source)
    value_ext: jnp.ndarray  # [T+1, N] f32
    value_int: jnp.ndarray  # [T+1, N] f32
    policy: jnp.ndarray  # [T, N, A] logits | [T, N, 1] logp (continuous)


def _step_add(hi_lo: jnp.ndarray, n: int) -> jnp.ndarray:
    """Add ``n`` frames to the [hi, lo] base-2**30 counter (jit-safe)."""
    lo = hi_lo[1] + n
    hi = hi_lo[0] + lo // GLOBAL_STEP_BASE
    return jnp.stack([hi, lo % GLOBAL_STEP_BASE])


class RNDAgent:
    """Host-side wrapper owning modules, optimizer, and the jitted programs."""

    def __init__(
        self,
        cfg: Config,
        output_size: int,
        action_space: ActionSpaceType = ActionSpaceType.DISCRETE,
        axis_name: Optional[str] = None,
    ):
        self.cfg = cfg
        self.output_size = output_size
        self.action_space = action_space
        self.axis_name = axis_name
        self.train_method = cfg.train_method

        self.network = ActorCritic(
            cfg=cfg, output_size=output_size, action_space=action_space
        )
        self.use_rnd = self.train_method in (
            TrainMethod.ORIGINAL_RND,
            TrainMethod.MODIFIED_RND,
        )
        self.pixel_rnd = self.train_method == TrainMethod.ORIGINAL_RND
        if self.use_rnd:
            self.rnd_pred = RNDPredictor(pixel_input=self.pixel_rnd)
            self.rnd_target_net = RNDTarget(pixel_input=self.pixel_rnd)

        self.ssl = None
        if cfg.representation_lr_method != RepresentationMethod.NONE:
            from eavit_tpu.models.ssl import make_ssl

            self.ssl = make_ssl(cfg, self.network)

        self.tx = self._make_optimizer()

        # jitted entry points
        self._act = jax.jit(
            self._act_impl,
            static_argnames=("deterministic", "greedy"),
            donate_argnums=(),
        )
        self._update = jax.jit(self._update_impl, donate_argnums=(0,))
        self._obs_rms_update = jax.jit(self._obs_rms_update_impl, donate_argnums=(0,))
        self._intrinsic = jax.jit(self._intrinsic_impl)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def _make_optimizer(self) -> optax.GradientTransformation:
        chain = []
        if self.cfg.use_grad_clipping:
            chain.append(optax.clip_by_global_norm(self.cfg.max_grad_norm))
        # torch.optim.Adam defaults (reference agents.py:158)
        chain.append(
            # StableEps wires to the Adam eps here. The reference parses the
            # key but never reads it (its Adam uses torch's default 1e-8,
            # agents.py:161; utils.py:630) — honoring it is this repo's
            # policy for parsed-but-dead reference keys (like
            # UpdateProportion, config.py:12-14); the default matches the
            # reference's effective value, so .conf parity is unchanged.
            optax.adam(self.cfg.learning_rate, b1=0.9, b2=0.999,
                       eps=self.cfg.stable_eps)
        )
        return optax.chain(*chain)

    def init_state(self, rng: jax.Array) -> AgentState:
        cfg = self.cfg
        k_pol, k_pred, k_targ, k_ssl = jax.random.split(rng, 4)
        obs_shape = (1, cfg.state_stack_size, cfg.pre_proc_height, cfg.pre_proc_width)
        dummy = jnp.zeros(obs_shape, jnp.float32)
        policy_params = self.network.init(k_pol, dummy)["params"]

        params: Dict[str, Any] = {"policy": policy_params}
        rnd_target = None
        obs_rms = None
        if self.use_rnd:
            if self.pixel_rnd:
                rnd_in = jnp.zeros(
                    (1, 1, cfg.pre_proc_height, cfg.pre_proc_width), jnp.float32
                )
                obs_rms = norm.rms_init(
                    (1, cfg.pre_proc_height, cfg.pre_proc_width)
                )
            else:
                rnd_in = jnp.zeros((1, cfg.backbone_dim), jnp.float32)
                obs_rms = norm.rms_init((1, cfg.backbone_dim))
            params["rnd_pred"] = self.rnd_pred.init(k_pred, rnd_in)["params"]
            rnd_target = self.rnd_target_net.init(k_targ, rnd_in)["params"]

        ssl_target = None
        if self.ssl is not None:
            ssl_params, ssl_target = self.ssl.init(k_ssl, policy_params)
            params["ssl"] = ssl_params

        opt_state = self.tx.init(params)
        return AgentState(
            params=params,
            rnd_target=rnd_target,
            ssl_target=ssl_target,
            opt_state=opt_state,
            obs_rms=obs_rms,
            reward_rms=norm.rms_init(()),
            reward_filter=norm.reward_filter_init(cfg.num_env_per_process),
            global_step=jnp.zeros((2,), jnp.int32),
            global_update=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    # act
    # ------------------------------------------------------------------

    def act(
        self,
        params: Any,
        obs_u8: jnp.ndarray,  # [N, C, H, W] uint8
        rng: jax.Array,
        deterministic_model: bool = False,
        greedy: bool = False,
    ):
        """Policy forward + sampling (reference agents.py:187-208).

        The reference keeps the model in train mode during rollouts, so
        dropout/noisy-net noise is live at act time; ``deterministic_model``
        True gives eval-mode forwards (reference eval.py / set_mode).
        ``greedy`` additionally replaces sampling with argmax logits
        (discrete) / the mean action (continuous) — a TPU-build addition:
        the reference's eval still SAMPLES from the softmax
        (eval.py:198-299), so greedy playback is opt-in here.
        Returns (actions, value_ext [N], value_int [N], policy) where policy
        is logits (discrete) or per-sample log-probs [N, 1] (continuous).
        """
        return self._act(
            params, obs_u8, rng, deterministic=deterministic_model, greedy=greedy
        )

    def _act_impl(self, params, obs_u8, rng, deterministic: bool, greedy: bool = False):
        k_sample, k_drop, k_noise = jax.random.split(rng, 3)
        obs = obs_u8.astype(jnp.float32) / 255.0
        out = self.network.apply(
            {"params": params["policy"]},
            obs,
            deterministic,
            rngs={"dropout": k_drop, "noise": k_noise},
        )
        if self.action_space == ActionSpaceType.DISCRETE:
            if greedy:
                actions = jnp.argmax(out.policy, axis=-1)
            else:
                actions = sample_categorical(k_sample, out.policy)
            return (
                actions,
                out.value_ext[:, 0],
                out.value_int[:, 0],
                out.policy,
            )
        if greedy:
            actions = out.policy  # mean of the tanh-mu Normal
            logp = normal_log_prob(out.policy, out.std, actions)
        else:
            actions, logp = sample_normal(k_sample, out.policy, out.std)
        return actions, out.value_ext[:, 0], out.value_int[:, 0], logp[:, None]

    # ------------------------------------------------------------------
    # intrinsic reward (standalone API, used by eval; the update computes
    # it inline for the whole rollout)
    # ------------------------------------------------------------------

    def compute_intrinsic_reward(
        self, state: AgentState, next_obs_u8: jnp.ndarray
    ) -> jnp.ndarray:
        assert self.use_rnd, 'RND cannot be used with TrainMethod == "PPO"'
        return self._intrinsic(state.params, state.rnd_target, state.obs_rms, next_obs_u8)

    def _rnd_input(self, params, obs_rms, next_obs_u8: jnp.ndarray) -> jnp.ndarray:
        """Normalized RND input from raw uint8 next-obs (flattened batch).

        original_RND: obs_rms over RAW pixel values (reference feeds
        unscaled 0..255 frames, train.py:662-666). modified_RND: backbone
        embeddings of next_obs/255, then obs_rms (train.py:667-673).
        """
        if self.pixel_rnd:
            return norm.rms_normalize(obs_rms, next_obs_u8.astype(jnp.float32))
        emb = self.network.apply(
            {"params": params["policy"]},
            next_obs_u8.astype(jnp.float32) / 255.0,
            True,
            method=ActorCritic.extract_features,
        )
        return norm.rms_normalize(obs_rms, jax.lax.stop_gradient(emb))

    def _intrinsic_impl(self, params, rnd_target, obs_rms, next_obs_u8):
        x = self._rnd_input(params, obs_rms, next_obs_u8)
        t = self.rnd_target_net.apply({"params": rnd_target}, x)
        p = self.rnd_pred.apply({"params": params["rnd_pred"]}, x)
        return intrinsic_reward(t, p)

    # ------------------------------------------------------------------
    # obs-norm warm-up
    # ------------------------------------------------------------------

    def update_obs_rms(self, state: AgentState, next_obs_u8: jnp.ndarray) -> AgentState:
        """Fold a batch of raw next-obs into obs_rms (reference train.py:502-569)."""
        if not self.use_rnd:
            return state
        return self._obs_rms_update(state, next_obs_u8)

    def _obs_rms_update_impl(self, state: AgentState, next_obs_u8):
        if self.pixel_rnd:
            x = next_obs_u8.astype(jnp.float32)
        else:
            x = self.network.apply(
                {"params": state.params["policy"]},
                next_obs_u8.astype(jnp.float32) / 255.0,
                True,
                method=ActorCritic.extract_features,
            )
        return state._replace(
            obs_rms=norm.rms_update(state.obs_rms, x, self.axis_name)
        )

    # ------------------------------------------------------------------
    # the one-big-jit update
    # ------------------------------------------------------------------

    def update(
        self, state: AgentState, rollout: Rollout, rng: jax.Array
    ) -> Tuple[AgentState, Dict[str, jnp.ndarray]]:
        return self._update(state, rollout, rng)

    def _update_impl(self, state: AgentState, ro: Rollout, rng: jax.Array):
        cfg = self.cfg
        T, N = ro.rewards.shape
        num_samples = T * N
        # TPU-efficiency schedule: merge cfg.minibatch_merge consecutive
        # minibatches into one optimizer step (config.py MiniBatchMerge;
        # default 1 = the reference's exact 4x32x256 schedule)
        merge = max(1, cfg.minibatch_merge)
        assert cfg.mini_batch % merge == 0, (cfg.mini_batch, merge)
        n_mb = cfg.mini_batch // merge
        batch_size = num_samples // n_mb

        def env_major(x):  # [T, N, ...] -> [N*T, ...]
            return jnp.swapaxes(x, 0, 1).reshape((num_samples,) + x.shape[2:])

        # ---- step 1-2: rewards, intrinsic rewards, normalization --------
        total_reward = jnp.clip(ro.rewards.T, -1.0, 1.0)  # [N, T] (train.py:708)
        total_done = ro.dones.T.astype(jnp.float32)  # [N, T]
        value_ext = ro.value_ext.T  # [N, T+1]
        value_int = ro.value_int.T

        new_obs_rms = state.obs_rms
        new_reward_rms = state.reward_rms
        new_reward_filter = state.reward_filter
        rnd_train_in = None
        int_target = None
        metrics: Dict[str, jnp.ndarray] = {}

        if self.use_rnd:
            next_obs_flat = env_major(ro.next_obs)  # [N*T, 1|C, H, W] u8
            # intrinsic rewards with PRE-update obs_rms (train.py:662-673)
            int_r_flat = self._intrinsic_impl(
                state.params, state.rnd_target, state.obs_rms, next_obs_flat
            )
            total_int_reward = int_r_flat.reshape(N, T)

            # RewardForwardFilter over steps, then scalar reward-RMS update
            # from the moments of the filtered array (train.py:736-740).
            # The filter discounts with the INTRINSIC gamma
            # (RewardForwardFilter(int_gamma), reference train.py:134).
            new_reward_filter, per_step = norm.reward_filter_scan(
                state.reward_filter, total_int_reward, cfg.int_gamma
            )
            flat = per_step.reshape(-1)
            if self.axis_name is not None:
                # exact pooled moments across the mesh: psum of
                # sum / sumsq / count (pmean of per-shard variances would
                # drop the between-shard mean-spread term)
                n = jax.lax.psum(jnp.asarray(flat.shape[0], jnp.float32),
                                 self.axis_name)
                s = jax.lax.psum(jnp.sum(flat), self.axis_name)
                ss = jax.lax.psum(jnp.sum(jnp.square(flat)), self.axis_name)
                mean = s / n
                var = ss / n - jnp.square(mean)
            else:
                mean = jnp.mean(flat)
                var = jnp.var(flat)
            new_reward_rms = norm.rms_update_from_moments(
                state.reward_rms, mean, var, per_step.shape[0]
            )
            total_int_reward = total_int_reward / jnp.sqrt(new_reward_rms.var)
            metrics["data/int_reward_per_epi"] = jnp.mean(
                jnp.sum(total_int_reward, axis=1)
            )
            metrics["data/int_reward_per_rollout"] = jnp.mean(total_int_reward)

        # ---- step 3: GAE targets ---------------------------------------
        ext_target, ext_adv = make_train_data(
            total_reward, total_done, value_ext, cfg.gamma, cfg.gae_lambda, cfg.use_gae
        )
        if self.use_rnd:
            int_tgt, int_adv = make_train_data(
                total_int_reward,
                jnp.zeros_like(total_int_reward),  # non-episodic (train.py:758)
                value_int,
                cfg.int_gamma,
                cfg.gae_lambda,
                cfg.use_gae,
            )
            # intrinsic-advantage coefficient, optionally annealed to 0 over
            # int_coef_decay_updates (0 = the reference's constant int_coef,
            # agents.py:472). global_update is a traced state scalar, so the
            # schedule is jit-stable (no recompiles across updates).
            int_coef = cfg.int_coef
            if cfg.int_coef_decay_updates > 0:
                frac = jnp.clip(
                    1.0
                    - state.global_update.astype(jnp.float32)
                    / float(cfg.int_coef_decay_updates),
                    0.0,
                    1.0,
                )
                int_coef = cfg.int_coef * frac
                metrics["train/int_coef"] = int_coef
            total_adv = int_adv * int_coef + ext_adv * cfg.ext_coef
            int_target = int_tgt.reshape(-1)
        else:
            total_adv = ext_adv * cfg.ext_coef
        ext_target = ext_target.reshape(-1)
        total_adv = total_adv.reshape(-1)

        # ---- step 4: obs_rms update, then RND train input (train.py:772,855)
        if self.use_rnd:
            if self.pixel_rnd:
                new_obs_rms = norm.rms_update(
                    state.obs_rms, next_obs_flat.astype(jnp.float32), self.axis_name
                )
            else:
                emb = self.network.apply(
                    {"params": state.params["policy"]},
                    next_obs_flat.astype(jnp.float32) / 255.0,
                    True,
                    method=ActorCritic.extract_features,
                )
                emb = jax.lax.stop_gradient(emb)
                new_obs_rms = norm.rms_update(state.obs_rms, emb, self.axis_name)
            rnd_train_in = self._rnd_input(state.params, new_obs_rms, next_obs_flat)
            rnd_train_in = jax.lax.stop_gradient(rnd_train_in)

        # ---- step 5: Epoch x MiniBatch PPO/RND SGD (agents.py:263-535) --
        s_all = env_major(ro.states)  # [N*T, C, H, W] u8
        y_all = env_major(ro.actions)
        old_policy_all = env_major(ro.policy)

        def loss_fn(params, ssl_target, batch, key):
            k_drop, k_noise, k_mask, k_ssl = jax.random.split(key, 4)
            obs = batch["s"].astype(jnp.float32) / 255.0
            out = self.network.apply(
                {"params": params["policy"]},
                obs,
                False,
                rngs={"dropout": k_drop, "noise": k_noise},
            )
            if self.action_space == ActionSpaceType.DISCRETE:
                log_prob = categorical_log_prob(out.policy, batch["y"])
                log_prob_old = categorical_log_prob(batch["old_policy"], batch["y"])
                entropy = categorical_entropy(out.policy)
            else:
                log_prob = normal_log_prob(out.policy, out.std, batch["y"])
                log_prob_old = batch["old_policy"][:, 0]
                entropy = normal_entropy(out.std, obs.shape[0])

            ppo = ppo_surrogate(
                log_prob,
                log_prob_old,
                batch["adv"],
                out.value_ext,
                batch["ext_target"],
                entropy,
                cfg.ppo_eps,
                out.value_int if self.use_rnd else None,
                batch.get("int_target"),
            )
            critic_loss = ppo.critic_ext_loss + ppo.critic_int_loss

            rl = jnp.zeros(())
            if self.use_rnd:
                x = batch["rnd_in"]
                t = self.rnd_target_net.apply({"params": state.rnd_target}, x)
                p = self.rnd_pred.apply({"params": params["rnd_pred"]}, x)
                mask_u = jax.random.uniform(k_mask, (x.shape[0],))
                rl = rnd_loss(t, p, mask_u, cfg.update_proportion)

            repr_loss = jnp.zeros(())
            repr_coef = 0.0
            if self.ssl is not None and not cfg.freeze_shared_backbone:
                # ssl_target is the CURRENT EMA target threaded through the
                # minibatch scan (reference updates it per minibatch,
                # agents.py:531-532)
                repr_loss = self.ssl.loss(params, ssl_target, batch["s"], k_ssl)
                repr_coef = self.ssl.loss_coef

            loss = (
                ppo.actor_loss
                + 0.5 * critic_loss
                - cfg.entropy_coef * ppo.entropy
                + rl
                + repr_coef * repr_loss
            )
            aux = {
                "train/loss": loss,
                "train/actor_loss": ppo.actor_loss,
                "train/critic_loss": 0.5 * critic_loss,
                "train/critic_ext_loss": 0.5 * ppo.critic_ext_loss,
                "train/critic_int_loss": 0.5 * ppo.critic_int_loss,
                "train/entropy": ppo.entropy,
                "train/entropy_loss": -cfg.entropy_coef * ppo.entropy,
                "train/approx_kl": ppo.approx_kl,
                "train/max_kl": ppo.max_kl,
                "train/clipfrac": ppo.clipfrac,
                "train/rnd_loss": rl,
                "train/representation_loss": repr_coef * repr_loss,
            }
            return loss, aux

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)  # diff wrt params only

        arrays = {
            "s": s_all,
            "y": y_all,
            "old_policy": old_policy_all,
            "adv": total_adv,
            "ext_target": ext_target,
        }
        if self.use_rnd:
            arrays["int_target"] = int_target
            arrays["rnd_in"] = rnd_train_in

        def gather(perm, x):
            """Permute once, then lay out as [n_mb, batch_size, ...]
            so the minibatch scan consumes contiguous leading-axis slices."""
            return x[perm].reshape((n_mb, batch_size) + x.shape[1:])

        # under verbose logging the last minibatch's gradient pytree is
        # threaded through the scan carry and returned for histogram dumps
        # (reference logs grad histograms per verbose update,
        # agents.py:500-506) — one extra params-sized buffer, no extra FLOPs
        collect_grads = cfg.verbose_logging
        grads0 = (
            jax.tree_util.tree_map(jnp.zeros_like, state.params)
            if collect_grads
            else None
        )

        def minibatch_step(carry, xs):
            params, opt_state, ssl_target, _ = carry
            batch, key = xs
            (_, aux), grads = grad_fn(
                params, jax.lax.stop_gradient(ssl_target), batch, key
            )
            if cfg.freeze_shared_backbone:
                grads["policy"]["feature"] = jax.tree_util.tree_map(
                    jnp.zeros_like, grads["policy"]["feature"]
                )
            if self.axis_name is not None:
                grads = jax.lax.pmean(grads, self.axis_name)
            aux["train/grad_norm_unclipped"] = global_grad_norm(grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if self.ssl is not None:
                ssl_target = self.ssl.update_target(params, ssl_target)
            kept = grads if collect_grads else None
            return (params, opt_state, ssl_target, kept), aux

        def epoch_step(carry, key):
            k_perm, k_mb = jax.random.split(key)
            perm = jax.random.permutation(k_perm, num_samples)[
                : n_mb * batch_size
            ]
            # ONE permutation gather per epoch (instead of a dynamic gather
            # per minibatch inside the scan): the scan body becomes pure
            # compute over contiguous slices
            batches = {k: gather(perm, v) for k, v in arrays.items()}
            keys = jax.random.split(k_mb, n_mb)
            carry, auxs = jax.lax.scan(minibatch_step, carry, (batches, keys))
            return carry, jax.tree_util.tree_map(jnp.mean, auxs)

        epoch_keys = jax.random.split(rng, cfg.epoch)
        (params, opt_state, ssl_target, last_grads), auxs = jax.lax.scan(
            epoch_step,
            (state.params, state.opt_state, state.ssl_target, grads0),
            epoch_keys,
        )
        metrics.update(
            {k: jnp.mean(v) for k, v in auxs.items()}
        )
        if collect_grads:
            metrics["_grads"] = last_grads
        metrics["data/ext_reward_per_rollout_mean"] = jnp.mean(total_reward)
        metrics["data/ext_reward_per_rollout_sum"] = jnp.sum(total_reward)
        if self.axis_name is not None:
            # replicate metrics across the mesh (per-device aux means differ)
            metrics = jax.lax.pmean(metrics, self.axis_name)

        new_state = AgentState(
            params=params,
            rnd_target=state.rnd_target,
            ssl_target=ssl_target,
            opt_state=opt_state,
            obs_rms=new_obs_rms,
            reward_rms=new_reward_rms,
            reward_filter=new_reward_filter,
            global_step=_step_add(state.global_step, num_samples),
            global_update=state.global_update + 1,
        )
        return new_state, metrics
