"""Actor-critic network over the dual-token ViT backbone
(reference model.py:85-354, `CnnActorCriticNetwork` — the "Cnn" is
historical; the live backbone is a ViT).

Heads (shared across both ViT flavors, reference model.py:226-263):

- actor: Linear(D, D) -> ReLU -> Linear(D, A)   (+ Tanh for continuous)
- extra_layer: Linear(D, D) -> ReLU (shared by both critics)
- critic_ext / critic_int: Linear(D, 1) applied to
  ``extra_layer(x) + x`` (residual, reference model.py:276-280)
- orthogonal init: actor & critics gain 0.01, extra_layer gain 0.1,
  zero biases; learnable ``log_std`` (init -0.5) for continuous actions.

Routing with explorative attention (reference model.py:273-296):
``value_int = critic_int(extra(x_explore) + x_explore)``,
``value_ext = critic_ext(extra(x_exploit) + x_exploit)``,
``policy = actor(aggregate(x_explore, x_exploit))`` with mean (default) or
sum aggregation. Without it, the single CLS stream feeds everything.

Reference bug NOT replicated: the HF CLS/dual paths compute ``value_ext``
with ``critic_int`` (reference model.py:321,343); here both flavors use the
correct head.
"""

from __future__ import annotations

from enum import Enum
from typing import Any, NamedTuple, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from eavit_tpu.config import Config, ViTImplementation
from eavit_tpu.models.layers import NoisyLinear, make_dense
from eavit_tpu.models.vit import DualTokenViT, DualTokenViTHG


class ActionSpaceType(str, Enum):
    DISCRETE = "discrete"
    CONTINUOUS = "continuous"


class PolicyOutput(NamedTuple):
    policy: jnp.ndarray  # [B, A] logits (discrete) or tanh-mu (continuous)
    std: Optional[jnp.ndarray]  # [A] (continuous only)
    value_ext: jnp.ndarray  # [B, 1]
    value_int: jnp.ndarray  # [B, 1]
    features: jnp.ndarray  # [B, D] aggregated backbone features


def _compute_dtype(cfg: Config) -> Any:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


def build_backbone(cfg: Config, *, attention_impl: Optional[str] = None) -> nn.Module:
    impl = attention_impl or cfg.attention_impl or (
        "pallas" if cfg.use_pallas_attention else "xla"
    )
    ffn_impl = "pallas" if cfg.fused_ffn else "xla"
    dtype = _compute_dtype(cfg)
    if cfg.vit_implementation_type == ViTImplementation.LUCIDRAINS:
        return DualTokenViT(
            cfg=cfg.vit,
            image_size=cfg.pre_proc_height,
            channels=cfg.state_stack_size,
            attention_impl=impl,
            ffn_impl=ffn_impl,
            shared_patch_stream=cfg.shared_patch_stream,
            dtype=dtype,
            remat=cfg.encoder_remat,
            name="feature",
        )
    return DualTokenViTHG(
        cfg=cfg.vit_hg,
        image_size=cfg.vit_hg.image_size or cfg.pre_proc_height,
        channels=cfg.vit_hg.num_channels or cfg.state_stack_size,
        attention_impl=impl,
        ffn_impl=ffn_impl,
        shared_patch_stream=cfg.shared_patch_stream,
        dtype=dtype,
        remat=cfg.encoder_remat,
        name="feature",
    )


class ActorCritic(nn.Module):
    """Backbone + heads; one jittable forward for act and train."""

    cfg: Config
    output_size: int
    action_space: ActionSpaceType = ActionSpaceType.DISCRETE
    attention_impl: Optional[str] = None

    def setup(self) -> None:
        cfg = self.cfg
        dim = cfg.backbone_dim
        dtype = _compute_dtype(cfg)
        self.feature = build_backbone(cfg, attention_impl=self.attention_impl)

        if cfg.use_noisy_net:
            self.actor_fc1 = NoisyLinear(dim, dtype=dtype)
            self.actor_fc2 = NoisyLinear(self.output_size, dtype=dtype)
            self.extra_fc = NoisyLinear(dim, dtype=dtype)
            self.critic_ext = NoisyLinear(1, dtype=dtype)
            self.critic_int = NoisyLinear(1, dtype=dtype)
        else:
            self.actor_fc1 = make_dense(dim, kernel_gain=0.01, zero_bias=True, dtype=dtype)
            self.actor_fc2 = make_dense(
                self.output_size, kernel_gain=0.01, zero_bias=True, dtype=dtype
            )
            self.extra_fc = make_dense(dim, kernel_gain=0.1, zero_bias=True, dtype=dtype)
            self.critic_ext = make_dense(1, kernel_gain=0.01, zero_bias=True, dtype=dtype)
            self.critic_int = make_dense(1, kernel_gain=0.01, zero_bias=True, dtype=dtype)

        if self.action_space == ActionSpaceType.CONTINUOUS:
            self.log_std = self.param(
                "log_std",
                lambda key, shape: jnp.full(shape, -0.5, jnp.float32),
                (self.output_size,),
            )

    def _head(self, layer, x, deterministic):
        if self.cfg.use_noisy_net:
            return layer(x, deterministic)
        return layer(x)

    def _actor(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        h = nn.relu(self._head(self.actor_fc1, x, deterministic))
        out = self._head(self.actor_fc2, h, deterministic)
        if self.action_space == ActionSpaceType.CONTINUOUS:
            out = jnp.tanh(out)
        return out.astype(jnp.float32)

    def _critic(self, layer, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        resid = nn.relu(self._head(self.extra_fc, x, deterministic)) + x
        return self._head(layer, resid, deterministic).astype(jnp.float32)

    def __call__(
        self,
        state: jnp.ndarray,  # [B, C, H, W], float in [0, 1]
        deterministic: bool = True,
        attn_aggregation_op: str = "mean",
    ) -> PolicyOutput:
        feats = self.feature(state, deterministic)
        if len(feats) == 2:  # explorative attention
            x_explore, x_exploit = feats
            value_int = self._critic(self.critic_int, x_explore, deterministic)
            value_ext = self._critic(self.critic_ext, x_exploit, deterministic)
            if attn_aggregation_op == "mean":
                x_comb = 0.5 * (x_explore + x_exploit)
            elif attn_aggregation_op == "sum":
                x_comb = x_explore + x_exploit
            else:
                raise ValueError("attn_aggregation_op must be 'mean' or 'sum'")
        else:  # CLS
            (x_comb,) = feats
            value_int = self._critic(self.critic_int, x_comb, deterministic)
            value_ext = self._critic(self.critic_ext, x_comb, deterministic)

        policy = self._actor(x_comb, deterministic)
        std = (
            jnp.exp(self.log_std)
            if self.action_space == ActionSpaceType.CONTINUOUS
            else None
        )
        return PolicyOutput(
            policy=policy,
            std=std,
            value_ext=value_ext,
            value_int=value_int,
            features=x_comb.astype(jnp.float32),
        )

    def extract_features(
        self, state: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """Backbone embeddings for modified_RND / SSL (reference
        agents.py:220-259 — which crashes on an undefined name for the
        dual-token path; the intended semantics built here return the
        aggregated embedding, matching what feeds the policy head).
        """
        feats = self.feature(state, deterministic)
        if len(feats) == 2:
            return (0.5 * (feats[0] + feats[1])).astype(jnp.float32)
        return feats[0].astype(jnp.float32)
