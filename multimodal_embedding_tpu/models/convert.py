"""HF checkpoint -> JAX params conversion for the dual-encoder towers.

The reference loads towers through ``transformers`` ``from_pretrained``
(reference main.py:804-824). Here the HF torch ``state_dict`` (or safetensors
file) is mapped tensor-by-tensor into the stacked-params scheme of
``models/towers.py``. Conversion is pure numpy — torch is only needed to read
``.bin`` checkpoints; config translation reads the HF ``config.json``.

Acceptance: tests/test_tower_parity.py builds *random-weight* HF torch models
(CLIPModel / SiglipModel), converts them, and asserts embedding parity —
exactly the numerical contract HF-checkpoint loading relies on, with no
network access required.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

from .towers import DualEncoderConfig, TextConfig, VisionConfig


def _t(x) -> np.ndarray:  # torch tensor / np array -> np
    if hasattr(x, "detach"):
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def _lin(sd: Mapping, prefix: str) -> dict:
    return {"w": _t(sd[f"{prefix}.weight"]).T, "b": _t(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping, prefix: str) -> dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _patch_w(conv_w: np.ndarray) -> np.ndarray:
    """torch conv weight [D, C, ph, pw] -> [ph*pw*C, D] matching patchify order."""
    return conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0])


def _stack_layers(layers: list[dict]) -> dict:
    import jax

    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layers)


def _encoder_from_hf(sd: Mapping, prefix: str, n_layers: int) -> dict:
    layers = []
    for i in range(n_layers):
        lp = f"{prefix}.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{lp}.layer_norm1"),
                "attn": {
                    "q": _lin(sd, f"{lp}.self_attn.q_proj"),
                    "k": _lin(sd, f"{lp}.self_attn.k_proj"),
                    "v": _lin(sd, f"{lp}.self_attn.v_proj"),
                    "o": _lin(sd, f"{lp}.self_attn.out_proj"),
                },
                "ln2": _ln(sd, f"{lp}.layer_norm2"),
                "mlp": {
                    "fc1": _lin(sd, f"{lp}.mlp.fc1"),
                    "fc2": _lin(sd, f"{lp}.mlp.fc2"),
                },
            }
        )
    return _stack_layers(layers)


# --- CLIP family (OpenAI / LAION / MetaCLIP / DFN) ---------------------------


def clip_config_from_hf(hf_cfg: Any) -> DualEncoderConfig:
    v, t = hf_cfg.vision_config, hf_cfg.text_config
    return DualEncoderConfig(
        vision=VisionConfig(
            image_size=v.image_size,
            patch_size=v.patch_size,
            dim=v.hidden_size,
            layers=v.num_hidden_layers,
            heads=v.num_attention_heads,
            mlp_dim=v.intermediate_size,
            proj_dim=hf_cfg.projection_dim,
            style="clip",
            act=v.hidden_act,
            ln_eps=v.layer_norm_eps,
        ),
        text=TextConfig(
            vocab_size=t.vocab_size,
            max_len=t.max_position_embeddings,
            dim=t.hidden_size,
            layers=t.num_hidden_layers,
            heads=t.num_attention_heads,
            mlp_dim=t.intermediate_size,
            proj_dim=hf_cfg.projection_dim,
            style="clip",
            act=t.hidden_act,
            ln_eps=t.layer_norm_eps,
            eos_token_id=t.eos_token_id,
        ),
        family="clip",
    )


def clip_params_from_hf(sd: Mapping, cfg: DualEncoderConfig) -> dict:
    vision = {
        "patch": {"w": _patch_w(_t(sd["vision_model.embeddings.patch_embedding.weight"]))},
        "cls": _t(sd["vision_model.embeddings.class_embedding"]),
        "pos": _t(sd["vision_model.embeddings.position_embedding.weight"]),
        # "pre_layrnorm" is HF's (sic) attribute name
        "pre_ln": _ln(sd, "vision_model.pre_layrnorm"),
        "encoder": _encoder_from_hf(sd, "vision_model.encoder", cfg.vision.layers),
        "post_ln": _ln(sd, "vision_model.post_layernorm"),
        "proj": _t(sd["visual_projection.weight"]).T,
    }
    text = {
        "tok": _t(sd["text_model.embeddings.token_embedding.weight"]),
        "pos": _t(sd["text_model.embeddings.position_embedding.weight"]),
        "encoder": _encoder_from_hf(sd, "text_model.encoder", cfg.text.layers),
        "final_ln": _ln(sd, "text_model.final_layer_norm"),
        "proj": _t(sd["text_projection.weight"]).T,
    }
    return _to_jnp({"vision": vision, "text": text})


# --- SigLIP family -----------------------------------------------------------


def siglip_config_from_hf(hf_cfg: Any) -> DualEncoderConfig:
    v, t = hf_cfg.vision_config, hf_cfg.text_config
    return DualEncoderConfig(
        vision=VisionConfig(
            image_size=v.image_size,
            patch_size=v.patch_size,
            dim=v.hidden_size,
            layers=v.num_hidden_layers,
            heads=v.num_attention_heads,
            mlp_dim=v.intermediate_size,
            proj_dim=None,
            style="siglip",
            act=v.hidden_act,
            ln_eps=v.layer_norm_eps,
        ),
        text=TextConfig(
            vocab_size=t.vocab_size,
            max_len=t.max_position_embeddings,
            dim=t.hidden_size,
            layers=t.num_hidden_layers,
            heads=t.num_attention_heads,
            mlp_dim=t.intermediate_size,
            proj_dim=t.hidden_size,
            style="siglip",
            act=t.hidden_act,
            ln_eps=t.layer_norm_eps,
        ),
        family="siglip",
    )


def _mha_from_torch_inproj(sd: Mapping, prefix: str, dim: int) -> dict:
    """torch nn.MultiheadAttention in_proj -> separate q/k/v + out."""
    w = _t(sd[f"{prefix}.in_proj_weight"])  # [3D, D]
    b = _t(sd[f"{prefix}.in_proj_bias"])  # [3D]
    return {
        "q": {"w": w[:dim].T, "b": b[:dim]},
        "k": {"w": w[dim : 2 * dim].T, "b": b[dim : 2 * dim]},
        "v": {"w": w[2 * dim :].T, "b": b[2 * dim :]},
        "o": _lin(sd, f"{prefix}.out_proj"),
    }


def siglip_params_from_hf(sd: Mapping, cfg: DualEncoderConfig) -> dict:
    d = cfg.vision.dim
    vision = {
        "patch": {
            "w": _patch_w(_t(sd["vision_model.embeddings.patch_embedding.weight"])),
            "b": _t(sd["vision_model.embeddings.patch_embedding.bias"]),
        },
        "pos": _t(sd["vision_model.embeddings.position_embedding.weight"]),
        "encoder": _encoder_from_hf(sd, "vision_model.encoder", cfg.vision.layers),
        "post_ln": _ln(sd, "vision_model.post_layernorm"),
        "head": {
            "probe": _t(sd["vision_model.head.probe"]),
            "attn": _mha_from_torch_inproj(sd, "vision_model.head.attention", d),
            "ln": _ln(sd, "vision_model.head.layernorm"),
            "mlp": {
                "fc1": _lin(sd, "vision_model.head.mlp.fc1"),
                "fc2": _lin(sd, "vision_model.head.mlp.fc2"),
            },
        },
    }
    text = {
        "tok": _t(sd["text_model.embeddings.token_embedding.weight"]),
        "pos": _t(sd["text_model.embeddings.position_embedding.weight"]),
        "encoder": _encoder_from_hf(sd, "text_model.encoder", cfg.text.layers),
        "final_ln": _ln(sd, "text_model.final_layer_norm"),
        "head": _lin(sd, "text_model.head"),
    }
    return _to_jnp({"vision": vision, "text": text})


def _to_jnp(tree, dtype=None):
    import jax

    def cast(x):
        a = jnp.asarray(x)
        return a.astype(dtype) if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating) else a

    return jax.tree.map(cast, tree)


def cast_params(params, dtype):
    import jax

    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, params
    )
