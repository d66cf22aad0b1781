"""Self-supervised auxiliary heads: BYOL and Barlow-Twins
(reference BYOL.py:10-224, BarlowTwins.py:11-167).

Both share the PPO backbone — in the reference via object identity asserts
(agents.py:102-126, train.py:203-206); here sharing is structural: the SSL
losses close over ``params["policy"]["feature"]``, the same pytree the PPO
loss differentiates, so one optimizer step updates both paths (exactly the
reference's deduped single Adam, agents.py:129-164).

BatchNorm note: the projector/predictor BN layers normalize by CURRENT batch
statistics (what torch BN does in train mode); running stats are not
tracked because the SSL heads are only ever used in train mode — evaluation
of these heads does not occur anywhere in the reference either.

Reference bitrot NOT replicated: BYOL's ``AddProjHead.forward`` calls the
raw ViT without the required ``attn_type`` argument (BYOL.py:91 vs
vit.py:136) and so crashes on the lucidrains path; the intended semantics —
backbone embedding -> projector — are built here, with the dual-token
embedding aggregated the same way the policy head receives it.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eavit_tpu.config import Config, RepresentationMethod
from eavit_tpu.models.layers import torch_linear_bias_init, torch_linear_kernel_init
from eavit_tpu.models.policy import build_backbone
from eavit_tpu.ops.augment import ssl_augment_pair


def _batch_norm(x: jnp.ndarray, scale=None, bias=None, eps: float = 1e-5):
    """Stateless train-mode BatchNorm1d over the batch axis."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale + bias
    return y


class BNMLP(nn.Module):
    """Linear -> BN -> ReLU -> Linear (reference BYOL.MLP, BYOL.py:64-77)."""

    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.hidden_size,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(x.shape[-1]),
            name="fc1",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.hidden_size,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.hidden_size,))
        x = nn.relu(_batch_norm(x, scale, bias))
        return nn.Dense(
            self.out_size,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(self.hidden_size),
            name="fc2",
        )(x)


class BTProjector(nn.Module):
    """Barlow-Twins projector: (Linear(no bias) -> BN -> ReLU)* -> Linear(no
    bias) (reference BarlowTwins.py:17-25)."""

    sizes: Tuple[int, ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, s in enumerate(self.sizes[:-1]):
            x = nn.Dense(
                s, use_bias=False, kernel_init=torch_linear_kernel_init(),
                name=f"fc{i}",
            )(x)
            scale = self.param(f"bn{i}_scale", nn.initializers.ones, (s,))
            bias = self.param(f"bn{i}_bias", nn.initializers.zeros, (s,))
            x = nn.relu(_batch_norm(x, scale, bias))
        return nn.Dense(
            self.sizes[-1], use_bias=False,
            kernel_init=torch_linear_kernel_init(), name="fc_out",
        )(x)


def _byol_loss_fn(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """2 - 2 * cos_sim per sample (reference BYOL.py:96-100)."""
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-12)
    return 2.0 - 2.0 * jnp.sum(x * y, axis=-1)


class _SSLBase:
    """Interface consumed by RNDAgent._update_impl."""

    loss_coef: float

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.backbone = build_backbone(cfg)
        self.same_on_batch = cfg.ssl.apply_same_transform_to_batch

    def _embed(self, feature_params: Any, imgs: jnp.ndarray) -> jnp.ndarray:
        feats = self.backbone.apply({"params": feature_params}, imgs, True)
        if len(feats) == 2:
            return (0.5 * (feats[0] + feats[1])).astype(jnp.float32)
        return feats[0].astype(jnp.float32)

    def init(self, rng: jax.Array, policy_params: Any) -> Tuple[Any, Any]:
        raise NotImplementedError

    def loss(self, params: Any, ssl_target: Any, states_u8: jnp.ndarray,
             rng: jax.Array) -> jnp.ndarray:
        raise NotImplementedError

    def update_target(self, params: Any, ssl_target: Any) -> Any:
        return ssl_target

    def _views(self, rng: jax.Array, states_u8: jnp.ndarray, blur_p: float):
        imgs = states_u8.astype(jnp.float32) / 255.0
        return ssl_augment_pair(rng, imgs, blur_p, self.same_on_batch)


class BYOLModule(_SSLBase):
    """BYOL online/target with EMA updates (reference BYOL.py:115-203)."""

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        s = cfg.ssl
        self.loss_coef = s.byol_representation_loss_coef
        self.decay = s.byol_moving_average_decay
        self.projector = BNMLP(s.byol_projection_hidden_size, s.byol_projection_size)
        # predictor hidden = 2 * projection_size (reference BYOL.py:146)
        self.predictor = BNMLP(2 * s.byol_projection_size, s.byol_projection_size)

    def init(self, rng: jax.Array, policy_params: Any) -> Tuple[Any, Any]:
        k1, k2 = jax.random.split(rng)
        dummy_emb = jnp.zeros((2, self.cfg.backbone_dim), jnp.float32)
        dummy_proj = jnp.zeros((2, self.cfg.ssl.byol_projection_size), jnp.float32)
        proj_params = self.projector.init(k1, dummy_emb)["params"]
        pred_params = self.predictor.init(k2, dummy_proj)["params"]
        ssl_params = {"projector": proj_params, "predictor": pred_params}
        # target = deepcopy of online backbone+projector (reference BYOL.py:163-166)
        target = jax.tree_util.tree_map(
            jnp.copy, {"feature": policy_params["feature"], "projector": proj_params}
        )
        return ssl_params, target

    def loss(self, params, ssl_target, states_u8, rng):
        v1, v2 = self._views(rng, states_u8, blur_p=0.5)
        feature = params["policy"]["feature"]
        proj = params["ssl"]["projector"]
        pred = params["ssl"]["predictor"]

        def online(v):
            z = self.projector.apply({"params": proj}, self._embed(feature, v))
            return self.predictor.apply({"params": pred}, z)

        def target(v):
            z = self.projector.apply(
                {"params": ssl_target["projector"]},
                self._embed(ssl_target["feature"], v),
            )
            return jax.lax.stop_gradient(z)

        loss = _byol_loss_fn(online(v1), target(v2)) + _byol_loss_fn(
            online(v2), target(v1)
        )
        return jnp.mean(loss)

    def update_target(self, params, ssl_target):
        """EMA: target <- a * target + (1 - a) * online (reference BYOL.py:168-176),
        called per minibatch (agents.py:531-532)."""
        online = {
            "feature": params["policy"]["feature"],
            "projector": params["ssl"]["projector"],
        }
        return jax.tree_util.tree_map(
            lambda t, o: t * self.decay + o * (1.0 - self.decay), ssl_target, online
        )


class BarlowTwinsModule(_SSLBase):
    """Barlow-Twins cross-correlation loss (reference BarlowTwins.py:50-64)."""

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        s = cfg.ssl
        self.loss_coef = s.barlow_twins_representation_loss_coef
        self.lambd = s.barlow_twins_lambda
        self.projector = BTProjector(tuple(s.barlow_twins_projection_sizes))

    def init(self, rng: jax.Array, policy_params: Any) -> Tuple[Any, Any]:
        dummy = jnp.zeros((2, self.cfg.backbone_dim), jnp.float32)
        return {"projector": self.projector.init(rng, dummy)["params"]}, None

    def loss(self, params, ssl_target, states_u8, rng):
        v1, v2 = self._views(rng, states_u8, blur_p=0.1)
        feature = params["policy"]["feature"]
        proj = params["ssl"]["projector"]
        z1 = self.projector.apply({"params": proj}, self._embed(feature, v1))
        z2 = self.projector.apply({"params": proj}, self._embed(feature, v2))
        b = z1.shape[0]
        c = _batch_norm(z1).T @ _batch_norm(z2) / b  # [P, P]
        on_diag = jnp.sum(jnp.square(jnp.diag(c) - 1.0))
        off_diag = jnp.sum(jnp.square(c)) - jnp.sum(jnp.square(jnp.diag(c)))
        return on_diag + self.lambd * off_diag


def make_ssl(cfg: Config, network=None) -> Optional[_SSLBase]:
    method = cfg.representation_lr_method
    if method == RepresentationMethod.NONE:
        return None
    if method == RepresentationMethod.BYOL:
        return BYOLModule(cfg)
    if method == RepresentationMethod.BARLOW_TWINS:
        return BarlowTwinsModule(cfg)
    raise ValueError(method)
