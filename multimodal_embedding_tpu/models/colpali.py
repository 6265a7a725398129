"""ColPali: PaliGemma-based multi-vector late-interaction retriever.

The reference treats ColPali as a black box via ``colpali_engine``
(reference main.py:811-813, scoring via ``processor.score`` main.py:467).
Here it is first-class:

- vision: headless SigLIP tower (towers.py, ``use_head=False``) -> [B, N, 1152]
- multimodal projector: linear to the Gemma width, scaled by 1/sqrt(hidden)
- language model: Gemma decoder (gemma.py) over [image features | prompt]
  with PaliGemma's inference prefix-LM mask (full attention among valid
  tokens — HF builds a non-causal mask when not training)
- retrieval head: linear to 128-d per token, L2-normalized per token, pad
  tokens zeroed (HF ColPaliForRetrieval semantics: ``emb * mask``)

Scoring convention: because pad embeddings are zeroed (not masked out),
MaxSim runs WITHOUT masks — a zero pad vector contributes a 0 floor to the
doc-token max and exactly 0 to the query sum, reproducing
``colpali_engine.score_multi_vector`` bit-for-bit. Parity vs HF
ColPaliForRetrieval is enforced in tests/test_colpali_parity.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.preprocess import PreprocessConfig, SIGLIP_MEAN, SIGLIP_STD
from .convert import _encoder_from_hf, _lin, _ln, _patch_w, _t, _to_jnp, cast_params
from .gemma import GemmaConfig, gemma_apply, gemma_embed, gemma_init
from .layers import Params
from .registry import ModelInfo
from .towers import VisionConfig, vision_tower_apply, vision_tower_init


@dataclass(frozen=True)
class ColPaliConfig:
    vision: VisionConfig
    gemma: GemmaConfig
    embedding_dim: int = 128
    image_token_id: int = 256000


def colpali_image_fwd(params: Params, cfg: ColPaliConfig, pixels: jax.Array) -> jax.Array:
    """pixels [B, S, S, 3] -> per-token embeddings [B, N + L_suffix, 128].

    The textual suffix ids ("<bos>Describe the image.\\n") travel in params
    as ``image_suffix_ids`` so the jitted forward is self-contained.
    """
    feats = vision_tower_apply(params["vision"], cfg.vision, pixels)  # [B, N, Dv]
    dtype = params["mm_proj"]["w"].dtype
    feats = feats.astype(dtype)
    proj = jnp.dot(feats, params["mm_proj"]["w"], preferred_element_type=jnp.float32)
    # HF PaliGemma divides image features by sqrt(hidden) and Gemma then
    # multiplies the MERGED embeddings by sqrt(hidden) — the two cancel, so
    # image features enter the decoder at raw projector scale while text
    # embeddings carry the sqrt(hidden) normalizer (gemma_embed).
    proj = (proj + params["mm_proj"]["b"].astype(jnp.float32)).astype(dtype)

    suffix = params["image_suffix_ids"]  # [L]
    b = pixels.shape[0]
    suffix_emb = gemma_embed(params["gemma"], cfg.gemma, jnp.broadcast_to(suffix, (b, suffix.shape[0])))
    embeds = jnp.concatenate([proj, suffix_emb.astype(dtype)], axis=1)
    hidden = gemma_apply(params["gemma"], cfg.gemma, embeds)
    out = jnp.dot(
        hidden, params["emb_proj"]["w"], preferred_element_type=jnp.float32
    ) + params["emb_proj"]["b"].astype(jnp.float32)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(norm, 1e-12)


def colpali_text_fwd(
    params: Params, cfg: ColPaliConfig, input_ids: jax.Array, mask: jax.Array | None
) -> jax.Array:
    """input_ids [B, T] -> per-token embeddings [B, T, 128], pads zeroed."""
    if mask is None:
        mask = jnp.ones_like(input_ids)
    embeds = gemma_embed(params["gemma"], cfg.gemma, input_ids)
    hidden = gemma_apply(params["gemma"], cfg.gemma, embeds, attn_mask=mask)
    out = jnp.dot(
        hidden, params["emb_proj"]["w"], preferred_element_type=jnp.float32
    ) + params["emb_proj"]["b"].astype(jnp.float32)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    out = out / jnp.maximum(norm, 1e-12)
    return out * mask[:, :, None].astype(out.dtype)


# --- HF conversion -------------------------------------------------------------


def colpali_config_from_hf(hf_cfg) -> ColPaliConfig:
    vlm = hf_cfg.vlm_config
    v, t = vlm.vision_config, vlm.text_config
    return ColPaliConfig(
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
            use_head=False,
        ),
        gemma=GemmaConfig(
            vocab_size=t.vocab_size,
            dim=t.hidden_size,
            layers=t.num_hidden_layers,
            heads=t.num_attention_heads,
            kv_heads=t.num_key_value_heads,
            head_dim=t.head_dim,
            mlp_dim=t.intermediate_size,
            rope_theta=t.rope_theta,
            rms_eps=t.rms_norm_eps,
        ),
        embedding_dim=hf_cfg.embedding_dim,
        image_token_id=vlm.image_token_index,
    )


def _gemma_from_hf(sd, prefix: str, n_layers: int) -> dict:
    layers = []
    for i in range(n_layers):
        lp = f"{prefix}.layers.{i}"
        layers.append(
            {
                "ln1": _t(sd[f"{lp}.input_layernorm.weight"]),
                "attn": {
                    "q": _t(sd[f"{lp}.self_attn.q_proj.weight"]).T,
                    "k": _t(sd[f"{lp}.self_attn.k_proj.weight"]).T,
                    "v": _t(sd[f"{lp}.self_attn.v_proj.weight"]).T,
                    "o": _t(sd[f"{lp}.self_attn.o_proj.weight"]).T,
                },
                "ln2": _t(sd[f"{lp}.post_attention_layernorm.weight"]),
                "mlp": {
                    "gate": _t(sd[f"{lp}.mlp.gate_proj.weight"]).T,
                    "up": _t(sd[f"{lp}.mlp.up_proj.weight"]).T,
                    "down": _t(sd[f"{lp}.mlp.down_proj.weight"]).T,
                },
            }
        )
    import jax as _jax

    stacked = _jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layers)
    return {
        "embed": _t(sd[f"{prefix}.embed_tokens.weight"]),
        "layers": stacked,
        "final_norm": _t(sd[f"{prefix}.norm.weight"]),
    }


def colpali_params_from_hf(sd, cfg: ColPaliConfig, image_suffix_ids: np.ndarray) -> dict:
    vt = "vlm.model.vision_tower.vision_model"
    vision = {
        "patch": {
            "w": _patch_w(_t(sd[f"{vt}.embeddings.patch_embedding.weight"])),
            "b": _t(sd[f"{vt}.embeddings.patch_embedding.bias"]),
        },
        "pos": _t(sd[f"{vt}.embeddings.position_embedding.weight"]),
        "encoder": _encoder_from_hf(sd, f"{vt}.encoder", cfg.vision.layers),
        "post_ln": _ln(sd, f"{vt}.post_layernorm"),
    }
    params = {
        "vision": vision,
        "mm_proj": _lin(sd, "vlm.model.multi_modal_projector.linear"),
        "gemma": _gemma_from_hf(sd, "vlm.model.language_model", cfg.gemma.layers),
        "emb_proj": _lin(sd, "embedding_proj_layer"),
        "image_suffix_ids": np.asarray(image_suffix_ids, np.int32),
    }
    return _to_jnp(params)


# --- loading -------------------------------------------------------------------


def colpali_init(key, cfg: ColPaliConfig, image_suffix_ids: np.ndarray, dtype=jnp.float32) -> Params:
    kv, kg, kp, ke = jax.random.split(key, 4)
    return {
        "vision": vision_tower_init(kv, cfg.vision, dtype),
        "mm_proj": {
            "w": jax.random.normal(kp, (cfg.vision.dim, cfg.gemma.dim), dtype) * 0.02,
            "b": jnp.zeros((cfg.gemma.dim,), dtype),
        },
        "gemma": gemma_init(kg, cfg.gemma, dtype),
        "emb_proj": {
            "w": jax.random.normal(ke, (cfg.gemma.dim, cfg.embedding_dim), dtype) * 0.02,
            "b": jnp.zeros((cfg.embedding_dim,), dtype),
        },
        "image_suffix_ids": jnp.asarray(image_suffix_ids, jnp.int32),
    }


def load_colpali(info: ModelInfo, dtype=jnp.bfloat16, checkpoint_dir: str | None = None):
    import torch
    from transformers import AutoProcessor, ColPaliForRetrieval

    from .colpali_processing import (
        colpali_query_tokenizer,
        image_prompt_suffix_ids,
        prompts_from_processor,
    )
    from .zoo import LoadedModel

    src = checkpoint_dir or info.hf_id
    hf = ColPaliForRetrieval.from_pretrained(src, torch_dtype=torch.float32)
    cfg = colpali_config_from_hf(hf.config)

    # Only the raw tokenizer + prompt-scheme constants come from the HF
    # processor; the query/image wrapping itself is ours
    # (colpali_processing.py, parity-tested vs ColPaliProcessor).
    proc = AutoProcessor.from_pretrained(src, trust_remote_code=info.trust_remote_code)
    prompts = prompts_from_processor(proc)
    suffix_ids = image_prompt_suffix_ids(proc.tokenizer, prompts)

    params = colpali_params_from_hf(hf.state_dict(), cfg, suffix_ids)
    del hf
    params = cast_params(params, dtype)
    return LoadedModel(
        info=info,
        cfg=cfg,
        params=params,
        preprocess=info.preprocess,
        tokenize=colpali_query_tokenizer(proc.tokenizer, prompts),
        multi_vector=True,
    )


def debug_colpali_config(image_size: int = 28) -> ColPaliConfig:
    return ColPaliConfig(
        vision=VisionConfig(
            image_size=image_size, patch_size=14, dim=32, layers=2, heads=4, mlp_dim=64,
            proj_dim=None, style="siglip", act="gelu_pytorch_tanh", ln_eps=1e-6, use_head=False,
        ),
        gemma=GemmaConfig(
            vocab_size=512, dim=48, layers=2, heads=4, kv_heads=1, head_dim=16, mlp_dim=96
        ),
        embedding_dim=16,
        image_token_id=500,
    )


def load_debug_colpali(info: ModelInfo, seed: int = 0, dtype=jnp.float32):
    from .zoo import LoadedModel, hash_tokenizer

    cfg = debug_colpali_config()
    suffix_ids = np.array([1, 7, 8, 9], np.int32)
    params = colpali_init(jax.random.key(seed), cfg, suffix_ids, dtype)
    base_tok = hash_tokenizer(cfg.gemma.vocab_size, 16, cfg.gemma.vocab_size - 1)

    pre = PreprocessConfig(
        image_size=cfg.vision.image_size, resize_mode="exact", mean=SIGLIP_MEAN, std=SIGLIP_STD
    )
    return LoadedModel(
        info=info,
        cfg=cfg,
        params=params,
        preprocess=pre,
        tokenize=base_tok,
        multi_vector=True,
        weights_provenance="debug-random",
    )
