"""Pretrained ViT weight import (reference vit.py:170-251 `load_pretrain`).

Maps a timm-format ViT state dict (the "jx" JAX-pretrained releases the
reference points at) onto :class:`DualTokenViT`'s parameter tree:

    pos_embed                  -> pos_embedding
    patch_embed.proj.{w,b}     -> patch_proj (conv kernel flattened to the
                                  patchify feature order: rows, cols, chans)
    cls_token                  -> cls_token, or BOTH exploration_token and
                                  exploitation_token (the reference's TODO at
                                  vit.py:171 — dual-token init from CLS)
    blocks.i.norm1/attn.qkv/attn.proj -> attn_i.{norm,to_qkv,to_out}
    blocks.i.norm2/mlp.fc1/fc2        -> ff_i.{norm,fc1,fc2}
    norm.{w,b}                 -> transformer final norm

Torch linear weights are [out, in] and transpose to flax's [in, out]; the
patch conv kernel [dim, C, p, p] flattens to match `patchify`'s
(p1, p2, c) feature order. Channel-count mismatches (RGB=3 checkpoints vs
frame-stack=4 inputs) are handled by mean-replicating the channel axis;
position-embedding grids are bilinearly interpolated when patch counts
differ.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _t(w) -> jnp.ndarray:  # torch [out, in] -> flax [in, out]
    return jnp.asarray(np.asarray(w)).T


def _interp_pos_embed(pos: np.ndarray, num_patches: int) -> np.ndarray:
    """[1, 1+P_src, D] -> [1, 1+P_dst, D] via bilinear grid resize."""
    tok, grid = pos[:, :1], pos[0, 1:]
    src = int(np.sqrt(grid.shape[0]))
    dst = int(np.sqrt(num_patches))
    if src * src != grid.shape[0] or dst * dst != num_patches:
        raise ValueError("non-square position grids cannot be interpolated")
    if src == dst:
        return pos
    g = grid.reshape(src, src, -1)
    g = jax.image.resize(jnp.asarray(g), (dst, dst, g.shape[-1]), "bilinear")
    return np.concatenate([tok, np.asarray(g).reshape(1, dst * dst, -1)], axis=1)


def _adapt_patch_kernel(
    w: np.ndarray, channels: int, patch: int
) -> np.ndarray:
    """timm conv kernel [D, C_src, p, p] -> flax dense [p*p*C_dst, D] in
    patchify's (row, col, channel) feature order."""
    d, c_src, p, _ = w.shape
    if p != patch:
        raise ValueError(f"patch size mismatch: checkpoint {p} vs model {patch}")
    if c_src != channels:
        w = np.repeat(w.mean(axis=1, keepdims=True), channels, axis=1)
    # [D, C, p1, p2] -> [p1, p2, C, D] -> [(p1 p2 c), D]
    w = w.transpose(2, 3, 1, 0).reshape(patch * patch * channels, d)
    return w


def load_pretrained_timm(
    params: Dict[str, Any],
    state_dict: Mapping[str, Any],
    *,
    channels: int,
    patch_size: int,
) -> Dict[str, Any]:
    """Return a copy of ``params['params']``-style tree for DualTokenViT
    (the ``feature`` subtree) with weights replaced from ``state_dict``."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    num_patches = out["pos_embedding"].shape[1] - 1
    out["pos_embedding"] = jnp.asarray(
        _interp_pos_embed(sd["pos_embed"], num_patches)
    )

    if "cls_token" in out:
        out["cls_token"] = jnp.asarray(sd["cls_token"])
    else:
        # dual-token init from the pretrained CLS (reference TODO vit.py:171)
        out["exploration_token"] = jnp.asarray(sd["cls_token"])
        out["exploitation_token"] = jnp.asarray(sd["cls_token"])

    out["patch_proj"] = dict(
        kernel=jnp.asarray(
            _adapt_patch_kernel(sd["patch_embed.proj.weight"], channels, patch_size)
        ),
        bias=jnp.asarray(sd["patch_embed.proj.bias"]),
    )

    tr = dict(out["transformer"])
    depth = sum(1 for k in tr if k.startswith("attn_"))
    for i in range(depth):
        pre = f"blocks.{i}."
        attn = dict(tr[f"attn_{i}"])
        attn["norm"] = dict(
            scale=jnp.asarray(sd[pre + "norm1.weight"]),
            bias=jnp.asarray(sd[pre + "norm1.bias"]),
        )
        qkv = dict(kernel=_t(sd[pre + "attn.qkv.weight"]))
        if "bias" in attn.get("to_qkv", {}):
            qkv["bias"] = jnp.asarray(sd[pre + "attn.qkv.bias"])
        attn["to_qkv"] = qkv
        attn["to_out"] = dict(
            kernel=_t(sd[pre + "attn.proj.weight"]),
            bias=jnp.asarray(sd[pre + "attn.proj.bias"]),
        )
        tr[f"attn_{i}"] = attn

        ff = dict(tr[f"ff_{i}"])
        ff["norm"] = dict(
            scale=jnp.asarray(sd[pre + "norm2.weight"]),
            bias=jnp.asarray(sd[pre + "norm2.bias"]),
        )
        ff["fc1"] = dict(
            kernel=_t(sd[pre + "mlp.fc1.weight"]),
            bias=jnp.asarray(sd[pre + "mlp.fc1.bias"]),
        )
        ff["fc2"] = dict(
            kernel=_t(sd[pre + "mlp.fc2.weight"]),
            bias=jnp.asarray(sd[pre + "mlp.fc2.bias"]),
        )
        tr[f"ff_{i}"] = ff

    if "norm.weight" in sd:
        tr["norm"] = dict(
            scale=jnp.asarray(sd["norm.weight"]),
            bias=jnp.asarray(sd["norm.bias"]),
        )
    out["transformer"] = tr

    # validate shapes against the existing tree
    def check(a, b):
        assert a.shape == b.shape, f"shape mismatch {a.shape} vs {b.shape}"
        return b

    jax.tree_util.tree_map(check, params, out)
    return out


def load_pretrain(params, path: str, *, channels: int, patch_size: int):
    """File-path entry matching the reference API (torch-format dict).

    Reference vit.py:170-251 fetches timm "jx" ViT weights; torch-saved
    checkpoints in the wild are either a flat ``state_dict`` or wrap it
    under a ``model`` / ``state_dict`` key (timm and lightning
    conventions) — both forms are accepted here. Covered end-to-end
    (real ``torch.save`` file -> transplant) in tests/test_pretrained.py.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "model"):
        if wrapper in sd and isinstance(sd[wrapper], Mapping):
            sd = sd[wrapper]
            break
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return load_pretrained_timm(
        params, sd, channels=channels, patch_size=patch_size
    )
