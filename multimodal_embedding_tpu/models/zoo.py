"""Model loading: HF checkpoints -> JAX bundles, plus offline debug models.

Replaces the reference's 3-way loader dispatch (reference main.py:804-824).
A loaded model is a uniform ``LoadedModel`` bundle: tower configs + params,
the preprocessing recipe, and a tokenize callable — everything the encoding
engine (models/encode.py) needs, regardless of family.

Two construction paths:
- :func:`load_model` — reads the HF checkpoint (config.json + weights) via
  the local transformers cache or an explicit directory and converts with
  models/convert.py. Degrades exactly like the reference: a load failure is
  reported and the model is skipped (reference main.py:822-824).
- :func:`load_debug_model` — small random-init stand-in with a deterministic
  hash tokenizer, for offline tests/benches (no network in CI).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.preprocess import PreprocessConfig, SIGLIP_MEAN, SIGLIP_STD
from .convert import (
    cast_params,
    clip_config_from_hf,
    clip_params_from_hf,
    siglip_config_from_hf,
    siglip_params_from_hf,
)
from .registry import ModelInfo
from .towers import (
    DualEncoderConfig,
    TextConfig,
    VisionConfig,
    dual_encoder_init,
    encode_image,
    encode_text,
)


@dataclass
class LoadedModel:
    info: ModelInfo
    cfg: Any
    params: Any
    preprocess: PreprocessConfig
    tokenize: Callable[[list[str]], tuple[np.ndarray, np.ndarray]]
    multi_vector: bool = False
    # Provenance of the weights, stamped into every result CSV ("real" =
    # converted HF checkpoint; "arch-random"/"debug-random" = random init —
    # throughput-valid but accuracy-meaningless).
    weights_provenance: str = "real"

    def image_features(self, pixels: jax.Array) -> jax.Array:
        return encode_image(self.params, self.cfg, pixels)

    def text_features(self, ids: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        return encode_text(self.params, self.cfg, ids, mask)


# --- tokenizers ---------------------------------------------------------------


def hf_tokenizer(info: ModelInfo):
    """Tokenize with the model's own HF tokenizer.

    SigLIP pads to max_length 64 like its HF processor. CLIP uses
    ``padding=True`` in the reference (main.py:427); we pad to the fixed 77
    instead for static TPU shapes — numerically identical because CLIP pools
    at the first-EOS position (``ids.argmax``: pad == eos, causal attention
    means later pads cannot influence it). ColPali does not come through
    here (its prompt wrapping lives in colpali_processing.py).
    """
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(info.hf_id, trust_remote_code=info.trust_remote_code)

    def tokenize(texts: list[str]):
        out = tok(
            texts,
            padding="max_length",
            truncation=True,
            max_length=info.text_max_len,
            return_tensors="np",
        )
        ids = out["input_ids"].astype(np.int32)
        mask = out.get("attention_mask")
        mask = None if mask is None else mask.astype(np.int32)
        return ids, mask

    return tokenize


def hash_tokenizer(vocab_size: int, max_len: int, eos_id: int):
    """Deterministic word-hash tokenizer for offline debug models."""

    def tokenize(texts: list[str]):
        ids = np.zeros((len(texts), max_len), np.int32)
        mask = np.zeros((len(texts), max_len), np.int32)
        for i, t in enumerate(texts):
            words = t.lower().split()[: max_len - 2]
            toks = [1] + [2 + (hash(w) % (vocab_size - 3)) for w in words] + [eos_id]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    return tokenize


# --- real checkpoint loading --------------------------------------------------


def load_model(
    info: ModelInfo,
    dtype=jnp.bfloat16,
    checkpoint_dir: str | None = None,
    native_cache_dir: str | None = None,
) -> LoadedModel:
    """Load and convert an HF checkpoint for a dense/siglip model.

    With ``native_cache_dir``, the converted params+config are persisted as a
    native .npz on first load and reloaded torch-free afterwards
    (models/checkpoint.py).

    colpali/jina families are handled by their dedicated modules
    (models/colpali.py, models/jina.py) and dispatched here.
    """
    if native_cache_dir and info.type in ("dense", "siglip"):
        from pathlib import Path

        from .checkpoint import load_params

        npz = Path(native_cache_dir) / f"{info.name}.npz"
        if npz.exists():
            params, cfg = load_params(npz)
            params = cast_params(params, dtype)
            return LoadedModel(
                info=info, cfg=cfg, params=params, preprocess=info.preprocess,
                tokenize=hf_tokenizer(info),
            )

    src = checkpoint_dir or info.hf_id
    if info.type == "colpali":
        from .colpali import load_colpali

        return load_colpali(info, dtype=dtype, checkpoint_dir=checkpoint_dir)
    if info.type == "jina":
        from .jina import load_jina

        return load_jina(info, dtype=dtype, checkpoint_dir=checkpoint_dir)

    import torch  # host-side checkpoint reading only

    if info.type == "siglip":
        from transformers import SiglipModel

        hf = SiglipModel.from_pretrained(src, torch_dtype=torch.float32)
        cfg = siglip_config_from_hf(hf.config)
        params = siglip_params_from_hf(hf.state_dict(), cfg)
    else:
        from transformers import CLIPModel

        hf = CLIPModel.from_pretrained(
            src, torch_dtype=torch.float32, trust_remote_code=info.trust_remote_code
        )
        cfg = clip_config_from_hf(hf.config)
        params = clip_params_from_hf(hf.state_dict(), cfg)
    del hf
    if native_cache_dir:
        from pathlib import Path

        from .checkpoint import save_params

        save_params(Path(native_cache_dir) / f"{info.name}.npz", params, cfg)
    params = cast_params(params, dtype)
    return LoadedModel(
        info=info,
        cfg=cfg,
        params=params,
        preprocess=info.preprocess,
        tokenize=hf_tokenizer(info),
    )


# --- offline debug models ------------------------------------------------------


def debug_dual_config(family: str, image_size: int = 64) -> DualEncoderConfig:
    style = "siglip" if family in ("siglip", "colpali") else "clip"
    vocab = 512
    return DualEncoderConfig(
        vision=VisionConfig(
            image_size=image_size,
            patch_size=16,
            dim=64,
            layers=2,
            heads=4,
            mlp_dim=128,
            proj_dim=32 if style == "clip" else None,
            style=style,
            act="quick_gelu" if style == "clip" else "gelu_pytorch_tanh",
        ),
        text=TextConfig(
            vocab_size=vocab,
            max_len=64,
            dim=64,
            layers=2,
            heads=4,
            mlp_dim=128,
            proj_dim=32 if style == "clip" else 64,
            style=style,
            act="quick_gelu" if style == "clip" else "gelu_pytorch_tanh",
            eos_token_id=vocab - 1,
        ),
        family=style,
    )


def load_debug_model(info: ModelInfo, seed: int = 0, dtype=jnp.float32) -> LoadedModel:
    """Random-init small model with the registry's preprocessing geometry kept
    tiny (64px) so offline CI runs are fast."""
    if info.type == "colpali":
        from .colpali import load_debug_colpali

        return load_debug_colpali(info, seed=seed, dtype=dtype)
    if info.type == "jina":
        from .jina import load_debug_jina

        return load_debug_jina(info, seed=seed, dtype=dtype)
    cfg = debug_dual_config(info.type)
    params = dual_encoder_init(jax.random.key(seed), cfg, dtype)
    pre = PreprocessConfig(
        image_size=cfg.vision.image_size,
        resize_mode="exact",
        mean=SIGLIP_MEAN,
        std=SIGLIP_STD,
    )
    return LoadedModel(
        info=info,
        cfg=cfg,
        params=params,
        preprocess=pre,
        tokenize=hash_tokenizer(cfg.text.vocab_size, cfg.text.max_len, cfg.text.eos_token_id),
        weights_provenance="debug-random",
    )
