"""HG-flavor parity against the real HuggingFace ViTModel (the module the
reference forked, vit_hg.py:46-402): our flax weights mapped into a torch
ViTModel must produce the same CLS-path outputs.

This pins the HG architecture choices: conv patch projection, qkv bias,
pre/post per-block LayerNorms at layer_norm_eps, GELU intermediate, final
LayerNorm, token-0 readout.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eavit_tpu.config import ViTHGConfig  # noqa: E402
from eavit_tpu.models.vit import DualTokenViTHG  # noqa: E402


def test_hg_cls_path_matches_transformers_vitmodel():
    hidden, heads, layers, inter, patch = 48, 4, 2, 96, 12
    img_size, ch = 84, 4

    cfg = ViTHGConfig(
        use_explorative_attn=False,  # CLS path == stock ViTModel semantics
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=inter,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        patch_size=patch,
        qkv_bias=True,
        layer_norm_eps=1e-12,
    )
    ours = DualTokenViTHG(cfg=cfg, image_size=img_size, channels=ch, dtype=jnp.float32)
    img = np.random.default_rng(0).random((2, ch, img_size, img_size)).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(img))
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    hf_cfg = transformers.ViTConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=inter,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12,
        image_size=img_size,
        patch_size=patch,
        num_channels=ch,
        qkv_bias=True,
    )
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False)
    hf.eval()

    def T(x):  # flax [in, out] -> torch [out, in]
        return torch.tensor(x.T.copy())

    sd = {}
    sd["embeddings.cls_token"] = torch.tensor(p["cls_token"])
    sd["embeddings.position_embeddings"] = torch.tensor(p["pos_embedding"])
    # flax conv kernel [kh, kw, in, out] -> torch [out, in, kh, kw]
    sd["embeddings.patch_embeddings.projection.weight"] = torch.tensor(
        p["patch_proj"]["kernel"].transpose(3, 2, 0, 1).copy()
    )
    sd["embeddings.patch_embeddings.projection.bias"] = torch.tensor(
        p["patch_proj"]["bias"]
    )
    enc = p["encoder"]
    d_head = hidden // heads
    for i in range(layers):
        a, f = enc[f"attn_{i}"], enc[f"ff_{i}"]
        pre = f"encoder.layer.{i}."
        qkv_k = a["to_qkv"]["kernel"]  # [hidden, 3*inner]
        qkv_b = a["to_qkv"]["bias"]
        q_k, k_k, v_k = np.split(qkv_k, 3, axis=1)
        q_b, k_b, v_b = np.split(qkv_b, 3)
        sd[pre + "attention.attention.query.weight"] = T(q_k)
        sd[pre + "attention.attention.query.bias"] = torch.tensor(q_b)
        sd[pre + "attention.attention.key.weight"] = T(k_k)
        sd[pre + "attention.attention.key.bias"] = torch.tensor(k_b)
        sd[pre + "attention.attention.value.weight"] = T(v_k)
        sd[pre + "attention.attention.value.bias"] = torch.tensor(v_b)
        sd[pre + "attention.output.dense.weight"] = T(a["to_out"]["kernel"])
        sd[pre + "attention.output.dense.bias"] = torch.tensor(a["to_out"]["bias"])
        sd[pre + "layernorm_before.weight"] = torch.tensor(a["norm"]["scale"])
        sd[pre + "layernorm_before.bias"] = torch.tensor(a["norm"]["bias"])
        sd[pre + "layernorm_after.weight"] = torch.tensor(f["norm"]["scale"])
        sd[pre + "layernorm_after.bias"] = torch.tensor(f["norm"]["bias"])
        sd[pre + "intermediate.dense.weight"] = T(f["fc1"]["kernel"])
        sd[pre + "intermediate.dense.bias"] = torch.tensor(f["fc1"]["bias"])
        sd[pre + "output.dense.weight"] = T(f["fc2"]["kernel"])
        sd[pre + "output.dense.bias"] = torch.tensor(f["fc2"]["bias"])
    sd["layernorm.weight"] = torch.tensor(enc["norm"]["scale"])
    sd["layernorm.bias"] = torch.tensor(enc["norm"]["bias"])

    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing

    (ours_cls,) = ours.apply(variables, jnp.asarray(img))
    with torch.no_grad():
        hf_out = hf(pixel_values=torch.tensor(img)).last_hidden_state[:, 0].numpy()
    np.testing.assert_allclose(np.asarray(ours_cls), hf_out, rtol=2e-4, atol=2e-4)
