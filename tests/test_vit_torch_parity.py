"""Behavioral parity of the dual-token ViT against a torch implementation
of the reference architecture (vit.py:93-167, intended semantics: each token
variant prepended to shared patch embeddings + pos-emb, pre-norm encoder,
final LayerNorm, token-0 pooling).

The torch model is built fresh from the architecture description and loaded
with the flax model's weights; outputs must agree to float tolerance. This
pins down every layer's math (patchify order, LN placement, qkv split, head
reshape, residuals) — not just shapes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eavit_tpu.config import ViTConfig  # noqa: E402
from eavit_tpu.models.vit import DualTokenViT  # noqa: E402


CFG = ViTConfig(
    dim=48, patch_size=12, depth=2, heads=4, dim_head=12, mlp_dim=96,
    dropout=0.0, emb_dropout=0.0,
)
IMG, CH = 84, 4


def t(x):  # flax [in, out] -> torch [out, in]
    return torch.tensor(np.asarray(x)).T.contiguous()


def v(x):
    return torch.tensor(np.asarray(x))


def torch_forward(params, img: np.ndarray, token_name: str) -> np.ndarray:
    """Reference-architecture forward in torch, weights from flax params."""
    p = params
    x = torch.tensor(img)  # [B, C, H, W]
    B = x.shape[0]
    ps = CFG.patch_size
    gh = IMG // ps
    # einops 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
    x = x.reshape(B, CH, gh, ps, gh, ps).permute(0, 2, 4, 3, 5, 1)
    x = x.reshape(B, gh * gh, ps * ps * CH)

    x = F.layer_norm(
        x, (x.shape[-1],), v(p["patch_norm_in"]["scale"]), v(p["patch_norm_in"]["bias"])
    )
    x = F.linear(x, t(p["patch_proj"]["kernel"]), v(p["patch_proj"]["bias"]))
    x = F.layer_norm(
        x, (CFG.dim,), v(p["patch_norm_out"]["scale"]), v(p["patch_norm_out"]["bias"])
    )

    tok = v(p[token_name]).expand(B, 1, CFG.dim)
    x = torch.cat([tok, x], dim=1)
    x = x + v(p["pos_embedding"])[:, : x.shape[1]]

    tr = p["transformer"]
    for i in range(CFG.depth):
        a = tr[f"attn_{i}"]
        h = F.layer_norm(x, (CFG.dim,), v(a["norm"]["scale"]), v(a["norm"]["bias"]))
        qkv = F.linear(h, t(a["to_qkv"]["kernel"]))  # no bias
        q, k, vv = qkv.chunk(3, dim=-1)

        def heads(z):
            return z.reshape(B, -1, CFG.heads, CFG.dim_head).transpose(1, 2)

        q, k, vv = heads(q), heads(k), heads(vv)
        dots = q @ k.transpose(-1, -2) * CFG.dim_head**-0.5
        attn = dots.softmax(dim=-1)
        out = (attn @ vv).transpose(1, 2).reshape(B, -1, CFG.heads * CFG.dim_head)
        out = F.linear(out, t(a["to_out"]["kernel"]), v(a["to_out"]["bias"]))
        x = x + out

        f_ = tr[f"ff_{i}"]
        h = F.layer_norm(x, (CFG.dim,), v(f_["norm"]["scale"]), v(f_["norm"]["bias"]))
        h = F.linear(h, t(f_["fc1"]["kernel"]), v(f_["fc1"]["bias"]))
        h = F.gelu(h)  # exact gelu, matching nn.gelu(approximate=False)
        h = F.linear(h, t(f_["fc2"]["kernel"]), v(f_["fc2"]["bias"]))
        x = x + h

    x = F.layer_norm(
        x, (CFG.dim,), v(tr["norm"]["scale"]), v(tr["norm"]["bias"])
    )
    return x[:, 0].numpy()


def test_dual_token_forward_matches_torch_reference_architecture():
    vit = DualTokenViT(cfg=CFG, image_size=IMG, channels=CH, dtype=jnp.float32)
    img = np.random.default_rng(0).random((3, CH, IMG, IMG)).astype(np.float32)
    variables = vit.init(jax.random.PRNGKey(0), jnp.asarray(img))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    ours_explore, ours_exploit = vit.apply(variables, jnp.asarray(img))
    with torch.no_grad():
        ref_explore = torch_forward(params, img, "exploration_token")
        ref_exploit = torch_forward(params, img, "exploitation_token")

    np.testing.assert_allclose(
        np.asarray(ours_explore), ref_explore, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours_exploit), ref_exploit, rtol=1e-4, atol=1e-4
    )
