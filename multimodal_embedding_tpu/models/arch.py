"""Full-scale architecture configs for the seven benchmark models.

Used when checkpoint weights are unavailable (offline benches, compile
checks): the *architecture* — and therefore the performance envelope — is
exactly that of the HF checkpoints the reference loads (main.py:129-137);
only the weights are random. When checkpoints are present, configs are read
from the checkpoint's config.json instead (models/convert.py) — these tables
are not used for correctness paths.

Sources: HF config.json of each model id.
"""

from __future__ import annotations

from .towers import DualEncoderConfig, TextConfig, VisionConfig


def _clip(
    *, img: int, v_dim: int, v_layers: int, v_heads: int, v_mlp: int, patch: int,
    t_dim: int, t_layers: int, t_heads: int, t_mlp: int, proj: int, act: str,
) -> DualEncoderConfig:
    return DualEncoderConfig(
        vision=VisionConfig(
            image_size=img, patch_size=patch, dim=v_dim, layers=v_layers, heads=v_heads,
            mlp_dim=v_mlp, proj_dim=proj, style="clip", act=act,
        ),
        text=TextConfig(
            vocab_size=49408, max_len=77, dim=t_dim, layers=t_layers, heads=t_heads,
            mlp_dim=t_mlp, proj_dim=proj, style="clip", act=act, eos_token_id=2,
        ),
        family="clip",
    )


def _vit_h(img: int, act: str) -> DualEncoderConfig:
    return _clip(
        img=img, v_dim=1280, v_layers=32, v_heads=16, v_mlp=5120, patch=14,
        t_dim=1024, t_layers=24, t_heads=16, t_mlp=4096, proj=1024, act=act,
    )


_SIGLIP_400M = DualEncoderConfig(
    vision=VisionConfig(
        image_size=384, patch_size=14, dim=1152, layers=27, heads=16, mlp_dim=4304,
        proj_dim=None, style="siglip", act="gelu_pytorch_tanh", ln_eps=1e-6,
    ),
    text=TextConfig(
        vocab_size=32000, max_len=64, dim=1152, layers=27, heads=16, mlp_dim=4304,
        proj_dim=1152, style="siglip", act="gelu_pytorch_tanh", ln_eps=1e-6,
    ),
    family="siglip",
)

FULL_ARCH_CONFIGS: dict[str, DualEncoderConfig] = {
    # openai/clip-vit-large-patch14-336
    "OpenAI-CLIP-L": _clip(
        img=336, v_dim=1024, v_layers=24, v_heads=16, v_mlp=4096, patch=14,
        t_dim=768, t_layers=12, t_heads=12, t_mlp=3072, proj=768, act="quick_gelu",
    ),
    # laion/CLIP-ViT-H-14-laion2B-s32B-b79K (open_clip -> gelu)
    "LAION-CLIP-H": _vit_h(224, "gelu"),
    # facebook/metaclip-h14-fullcc2.5b (OpenAI arch -> quick_gelu)
    "MetaCLIP-H14": _vit_h(224, "quick_gelu"),
    # apple/DFN5B-CLIP-ViT-H-14-378 (open_clip -> gelu)
    "Apple-DFN5B-H": _vit_h(378, "gelu"),
    # google/siglip-so400m-patch14-384
    "SigLIP-400M": _SIGLIP_400M,
    # google/siglip-base-patch16-224 (v15-era extra, reference paper.md:15-24)
    "SigLIP-Base": DualEncoderConfig(
        vision=VisionConfig(
            image_size=224, patch_size=16, dim=768, layers=12, heads=12, mlp_dim=3072,
            proj_dim=None, style="siglip", act="gelu_pytorch_tanh", ln_eps=1e-6,
        ),
        text=TextConfig(
            vocab_size=32000, max_len=64, dim=768, layers=12, heads=12, mlp_dim=3072,
            proj_dim=768, style="siglip", act="gelu_pytorch_tanh", ln_eps=1e-6,
        ),
        family="siglip",
    ),
}


def full_arch_config(name: str) -> DualEncoderConfig:
    return FULL_ARCH_CONFIGS[name]


def full_colpali_config():
    """vidore/colpali-v1.3: PaliGemma-3B (SigLIP-So400m/14-448 + Gemma-2B)
    with a 128-d retrieval head."""
    from .colpali import ColPaliConfig
    from .gemma import GemmaConfig

    return ColPaliConfig(
        vision=VisionConfig(
            image_size=448, patch_size=14, dim=1152, layers=27, heads=16, mlp_dim=4304,
            proj_dim=None, style="siglip", act="gelu_pytorch_tanh", ln_eps=1e-6,
            use_head=False,
        ),
        gemma=GemmaConfig(
            vocab_size=257216, dim=2048, layers=18, heads=8, kv_heads=1, head_dim=256,
            mlp_dim=16384,
        ),
        embedding_dim=128,
        image_token_id=257152,
    )


def full_jina_config():
    """jinaai/jina-clip-v1: EVA02-B/16 + JinaBERT-base."""
    from .jina import Eva02Config, JinaBertConfig, JinaClipConfig

    return JinaClipConfig(vision=Eva02Config(), text=JinaBertConfig())


def load_arch_model(name: str, seed: int = 0, dtype=None):
    """Random-init model at the FULL published architecture — for perf work
    and compile checks when checkpoint weights are unavailable (throughput is
    weight-independent)."""
    import jax
    import jax.numpy as jnp

    from .registry import model_info
    from .towers import dual_encoder_init
    from .zoo import LoadedModel, hash_tokenizer

    dtype = dtype or jnp.bfloat16
    info = model_info(name)
    key = jax.random.key(seed)
    if info.type == "colpali":
        import numpy as np

        from .colpali import colpali_init

        cfg = full_colpali_config()
        suffix = np.array([2, 10, 11, 12, 13, 14], np.int32)  # 6-token suffix
        params = colpali_init(key, cfg, suffix, dtype)
        return LoadedModel(
            info=info, cfg=cfg, params=params, preprocess=info.preprocess,
            tokenize=hash_tokenizer(cfg.gemma.vocab_size, 32, 1),
            multi_vector=True, weights_provenance="arch-random",
        )
    if info.type == "jina":
        from .jina import eva02_init, jina_bert_init

        cfg = full_jina_config()
        kv, kt = jax.random.split(key)
        params = {
            "vision": eva02_init(kv, cfg.vision, dtype),
            "text": jina_bert_init(kt, cfg.text, dtype),
        }
        return LoadedModel(
            info=info, cfg=cfg, params=params, preprocess=info.preprocess,
            tokenize=hash_tokenizer(cfg.text.vocab_size, info.text_max_len, 3),
            weights_provenance="arch-random",
        )
    cfg = full_arch_config(name)
    params = dual_encoder_init(key, cfg, dtype)
    return LoadedModel(
        info=info, cfg=cfg, params=params, preprocess=info.preprocess,
        tokenize=hash_tokenizer(cfg.text.vocab_size, cfg.text.max_len, 49407),
        weights_provenance="arch-random",
    )
