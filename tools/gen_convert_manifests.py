"""Generate converter key manifests: {state-dict key: shape} per model,
captured from locally-instantiated full-architecture HF models (meta device
— no weight memory, no network). Checked into tests/manifests/ so converter
<-> HF key drift fails offline (tests/test_convert_manifest.py).

Run from the repo root: python tools/gen_convert_manifests.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch

OUT = Path(__file__).resolve().parent.parent / "tests" / "manifests"


def dump(name: str, sd: dict) -> None:
    man = {k: list(v.shape) for k, v in sorted(sd.items())}
    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / f"{name}.json"
    path.write_text(json.dumps(man, indent=0, sort_keys=True))
    print(f"{name}: {len(man)} keys -> {path}")


def clip(name, *, img, v_dim, v_layers, v_heads, v_mlp, patch,
         t_dim, t_layers, t_heads, t_mlp, proj, act):
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config={
            "hidden_size": t_dim, "num_hidden_layers": t_layers,
            "num_attention_heads": t_heads, "intermediate_size": t_mlp,
            "vocab_size": 49408, "max_position_embeddings": 77,
            "hidden_act": act, "eos_token_id": 49407,
        },
        vision_config={
            "hidden_size": v_dim, "num_hidden_layers": v_layers,
            "num_attention_heads": v_heads, "intermediate_size": v_mlp,
            "image_size": img, "patch_size": patch, "hidden_act": act,
        },
        projection_dim=proj,
    )
    with torch.device("meta"):
        m = CLIPModel(cfg)
    dump(name, m.state_dict())


def siglip(name, *, img, patch, dim, layers, heads, mlp, max_len, vocab):
    from transformers import SiglipConfig, SiglipModel

    cfg = SiglipConfig(
        text_config={
            "hidden_size": dim, "num_hidden_layers": layers,
            "num_attention_heads": heads, "intermediate_size": mlp,
            "vocab_size": vocab, "max_position_embeddings": max_len,
        },
        vision_config={
            "hidden_size": dim, "num_hidden_layers": layers,
            "num_attention_heads": heads, "intermediate_size": mlp,
            "image_size": img, "patch_size": patch,
        },
    )
    with torch.device("meta"):
        m = SiglipModel(cfg)
    dump(name, m.state_dict())


def colpali():
    """vidore/colpali-v1.3 = colpali_engine ColPali: PaliGemma-3B under the
    'vlm.' prefix + a 128-d 'embedding_proj_layer' retrieval head
    (models/colpali.py:colpali_params_from_hf)."""
    from transformers import PaliGemmaConfig, PaliGemmaForConditionalGeneration

    cfg = PaliGemmaConfig(
        vision_config={
            "hidden_size": 1152, "num_hidden_layers": 27, "num_attention_heads": 16,
            "intermediate_size": 4304, "image_size": 448, "patch_size": 14,
            "projection_dim": 2048,
        },
        text_config={
            "vocab_size": 257216, "hidden_size": 2048, "num_hidden_layers": 18,
            "num_attention_heads": 8, "num_key_value_heads": 1, "head_dim": 256,
            "intermediate_size": 16384, "model_type": "gemma",
        },
        projection_dim=2048,
        image_token_index=257152,
    )
    with torch.device("meta"):
        m = PaliGemmaForConditionalGeneration(cfg)
    sd = {f"vlm.{k}": v for k, v in m.state_dict().items()}
    sd["embedding_proj_layer.weight"] = torch.empty(128, 2048, device="meta")
    sd["embedding_proj_layer.bias"] = torch.empty(128, device="meta")
    dump("ColPali-v1.3", sd)


def jina():
    """jinaai/jina-clip-v1 (EVA02-B/16 + JinaBERT): keys per the checkpoint
    schema mirrored by tests/jina_torch_reference.py."""
    from tests.jina_torch_reference import Eva02Torch, JinaBertTorch, JinaClipTorch

    from multimodal_embedding_tpu.models.jina import Eva02Config, JinaBertConfig

    v, t = Eva02Config(), JinaBertConfig()
    with torch.device("meta"):
        vision = Eva02Torch(
            image_size=v.image_size, patch_size=v.patch_size, dim=v.dim,
            layers=v.layers, heads=v.heads, mlp_dim=v.mlp_dim, proj_dim=v.proj_dim,
            eps=v.ln_eps, rope_theta=v.rope_theta, rope_pt_grid=v.rope_pt_grid,
        )
        bert = JinaBertTorch(t.vocab_size, t.dim, t.layers, t.heads, t.mlp_dim)
        m = JinaClipTorch(vision, bert)
    dump("Jina-CLIP-v1", m.state_dict())


def qwen3():
    """Qwen/Qwen3-14B — the reference's RL base model
    (train_rl_pure_lora.py:74-82); untied lm_head, per-head q/k norms."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=151936, hidden_size=5120, intermediate_size=17408,
        num_hidden_layers=40, num_attention_heads=40, num_key_value_heads=8,
        head_dim=128, rope_theta=1e6, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    with torch.device("meta"):
        m = Qwen3ForCausalLM(cfg)
    dump("Qwen3-14B", m.state_dict())


def main():
    clip("OpenAI-CLIP-L", img=336, v_dim=1024, v_layers=24, v_heads=16, v_mlp=4096,
         patch=14, t_dim=768, t_layers=12, t_heads=12, t_mlp=3072, proj=768,
         act="quick_gelu")
    clip("LAION-CLIP-H", img=224, v_dim=1280, v_layers=32, v_heads=16, v_mlp=5120,
         patch=14, t_dim=1024, t_layers=24, t_heads=16, t_mlp=4096, proj=1024,
         act="gelu")
    clip("MetaCLIP-H14", img=224, v_dim=1280, v_layers=32, v_heads=16, v_mlp=5120,
         patch=14, t_dim=1024, t_layers=24, t_heads=16, t_mlp=4096, proj=1024,
         act="quick_gelu")
    clip("Apple-DFN5B-H", img=378, v_dim=1280, v_layers=32, v_heads=16, v_mlp=5120,
         patch=14, t_dim=1024, t_layers=24, t_heads=16, t_mlp=4096, proj=1024,
         act="gelu")
    siglip("SigLIP-400M", img=384, patch=14, dim=1152, layers=27, heads=16,
           mlp=4304, max_len=64, vocab=32000)
    colpali()
    jina()
    qwen3()


if __name__ == "__main__":
    main()
