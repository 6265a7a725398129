"""Model debug probes (reference A28: test_siglip_debug.py,
test_siglip_coco_sample.py, run_benchmark_openai_apple_only.py's setup check).

For each requested model: load (real / arch / debug weights), encode a test
image and captions, and report embedding shapes, norms (~1.0 after L2),
mean/std statistics, the positive-vs-negative cosine margin, and a
sanity-threshold verdict (sim > 0.2 passes with real weights,
test_siglip_debug.py:52-55). Exits nonzero on failure — usable as a setup
verification like run_benchmark_openai_apple_only.py:61-104.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..models.encode import EncodingEngine
from ..models.registry import get_models_to_test
from ..models.zoo import load_debug_model, load_model
from ..parallel.mesh import get_mesh
from ..utils.logging import setup_logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Model setup verification probe")
    p.add_argument("--models", default="all")
    p.add_argument("--weights", choices=["real", "arch", "debug"], default="real")
    p.add_argument("--sim-threshold", type=float, default=0.2,
                   help="pos-pair cosine must exceed this (real weights only)")
    p.add_argument("--hf-parity", action="store_true",
                   help="also run the HF torch reference on the same fixture "
                        "and require per-row embedding cosine >= "
                        "--parity-threshold (the one-command gate between "
                        "this framework and the reference numbers)")
    p.add_argument("--parity-threshold", type=float, default=0.999)
    p.add_argument("--checkpoint-dir", default=None,
                   help="local checkpoint directory override (instead of the "
                        "HF hub id) for both our loader and the HF reference")
    return p.parse_args(argv)


def _cosine_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a.reshape(a.shape[0], -1).astype(np.float64)
    b = b.reshape(b.shape[0], -1).astype(np.float64)
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12)


def _checkpoint_state_dict(src):
    """Raw torch state dict from a checkpoint directory (safetensors or
    .bin shards), falling back to transformers remote-code loading — lets the
    jina gate run without executing the checkpoint's modeling code."""
    from pathlib import Path

    p = Path(src)
    if p.is_dir():
        shards = sorted(p.glob("*.safetensors"))
        if shards:
            from safetensors.torch import load_file

            sd = {}
            for f in shards:
                sd.update(load_file(f))
            return sd
        shards = sorted(p.glob("pytorch_model*.bin"))
        if shards:
            import torch

            sd = {}
            for f in shards:
                sd.update(torch.load(f, map_location="cpu", weights_only=True))
            return sd
    from transformers import AutoModel

    return AutoModel.from_pretrained(src, trust_remote_code=True).state_dict()


def _colpali_parity(model, info, src: str, threshold: float) -> bool:
    """ColPali gate via transformers.ColPaliForRetrieval (no colpali_engine
    needed — same HF class tests/test_colpali_parity.py proves against)."""
    import torch

    import jax.numpy as jnp

    from transformers import ColPaliForRetrieval

    from ..models.colpali import colpali_image_fwd, colpali_text_fwd

    hf = ColPaliForRetrieval.from_pretrained(src, torch_dtype=torch.float32).eval()
    cfg = model.cfg
    rng = np.random.default_rng(0)

    size = cfg.vision.image_size
    n_patches = (size // cfg.vision.patch_size) ** 2
    suffix = np.asarray(model.params["image_suffix_ids"], np.int64)
    pixels = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    ids_img = np.concatenate(
        [np.full((1, n_patches), cfg.image_token_id, np.int64), suffix[None]], axis=1
    )
    with torch.no_grad():
        ref_img = hf(
            input_ids=torch.from_numpy(ids_img),
            attention_mask=torch.ones_like(torch.from_numpy(ids_img)),
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
        ).embeddings.numpy()
    ours_img = np.asarray(
        colpali_image_fwd(model.params, cfg, jnp.asarray(pixels)), np.float32
    )

    ids = rng.integers(3, cfg.gemma.vocab_size - 3, size=(2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[0, :5] = 0  # processor-style left padding
    ids[0, :5] = 0
    with torch.no_grad():
        ref_txt = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).embeddings.numpy()
    ours_txt = np.asarray(
        colpali_text_fwd(model.params, cfg, jnp.asarray(ids), jnp.asarray(mask)),
        np.float32,
    )
    del hf

    ci = _cosine_rows(ours_img, ref_img)
    ct = _cosine_rows(ours_txt, ref_txt)
    print(f"  hf-parity cosine (multi-vector): image {ci.min():.6f}, text {ct.min():.6f}")
    if min(ci.min(), ct.min()) < threshold:
        print(f"  ❌ hf-parity below {threshold}")
        return False
    return True


def _jina_parity(model, info, src: str, threshold: float) -> bool:
    """Jina gate via the independent torch reference
    (tests/jina_torch_reference.py — same key schema as the checkpoint)
    loaded with the REAL checkpoint weights: avoids executing the
    checkpoint's remote modeling code while still comparing against torch
    numerics at the converted weights."""
    import torch

    import jax.numpy as jnp

    try:
        from tests.jina_torch_reference import Eva02Torch, JinaBertTorch, JinaClipTorch
    except ImportError:
        print("  (hf-parity: tests/jina_torch_reference.py not importable from "
              "this install; jina gate needs the repo checkout — skipped)")
        return True

    from ..models.jina import jina_config_from_sd

    sd = _checkpoint_state_dict(src)
    cfg = jina_config_from_sd(sd)
    v, t = cfg.vision, cfg.text
    vision = Eva02Torch(
        image_size=v.image_size, patch_size=v.patch_size, dim=v.dim, layers=v.layers,
        heads=v.heads, mlp_dim=v.mlp_dim, proj_dim=v.proj_dim, eps=v.ln_eps,
        rope_theta=v.rope_theta, rope_pt_grid=v.rope_pt_grid,
    )
    bert = JinaBertTorch(t.vocab_size, t.dim, t.layers, t.heads, t.mlp_dim)
    ref = JinaClipTorch(vision, bert).eval()
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    # proj bias exists in the real checkpoint but is optional in the torch ref
    real_missing = [k for k in missing if k != "vision.proj_b"]
    if real_missing or unexpected:
        print(f"  ❌ hf-parity: torch reference/state-dict key drift: "
              f"missing={real_missing[:4]} unexpected={list(unexpected)[:4]}")
        return False

    from ..models.encode import model_image_fwd, model_text_fwd

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, v.image_size, v.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(pixels.transpose(0, 3, 1, 2))).numpy()
    ours_img = np.asarray(model_image_fwd(model, model.params, jnp.asarray(pixels)), np.float32)

    ids = rng.integers(3, t.vocab_size - 3, size=(2, 48)).astype(np.int64)
    mask = np.ones((2, 48), np.int64)
    mask[1, 32:] = 0
    with torch.no_grad():
        ref_txt = ref.encode_text(torch.from_numpy(ids), torch.from_numpy(mask)).numpy()
    ours_txt = np.asarray(
        model_text_fwd(model, model.params, jnp.asarray(ids), jnp.asarray(mask)), np.float32
    )
    del ref

    ci = _cosine_rows(ours_img, ref_img)
    ct = _cosine_rows(ours_txt, ref_txt)
    print(f"  hf-parity cosine: image {ci.min():.6f}, text {ct.min():.6f}")
    if min(ci.min(), ct.min()) < threshold:
        print(f"  ❌ hf-parity below {threshold}")
        return False
    return True


def hf_parity_check(model, info, checkpoint_dir: str | None = None,
                    threshold: float = 0.999) -> bool:
    """Run the HF torch reference on the same pixel/token fixture and require
    per-row cosine >= threshold for image and text embeddings.

    Supersedes the reference's setup verification
    (run_benchmark_openai_apple_only.py:61-104) with an actual numerical
    gate: identical inputs into both stacks. dense/siglip go through
    CLIPModel/SiglipModel get_*_features; colpali through
    transformers.ColPaliForRetrieval; jina through the independent torch
    reference loaded with the checkpoint weights — all 7 models are gated.
    """
    import jax.numpy as jnp

    src = checkpoint_dir or info.hf_id
    try:
        if info.type == "colpali":
            return _colpali_parity(model, info, src, threshold)
        if info.type == "jina":
            return _jina_parity(model, info, src, threshold)
    except Exception as e:
        print(f"  ❌ hf-parity: {info.type} reference failed: {e}")
        return False
    try:
        import torch
        from transformers import CLIPModel, SiglipModel

        cls = SiglipModel if info.type == "siglip" else CLIPModel
        hf = cls.from_pretrained(
            src, torch_dtype=torch.float32, trust_remote_code=info.trust_remote_code
        ).eval()
    except Exception as e:
        print(f"  ❌ hf-parity: reference load failed: {e}")
        return False

    rng = np.random.default_rng(0)
    size = model.cfg.vision.image_size
    pixels = rng.standard_normal((2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        ref_img = hf.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    ours_img = np.asarray(model.image_features(jnp.asarray(pixels))).astype(np.float32)

    tcfg = model.cfg.text
    ids = rng.integers(3, tcfg.vocab_size - 3, size=(2, tcfg.max_len))
    if info.type == "dense":  # CLIP pools at BOS/EOS positions
        ids[:, 0] = tcfg.vocab_size - 2
        ids[:, -1] = tcfg.vocab_size - 1
    with torch.no_grad():
        ref_txt = hf.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    ours_txt = np.asarray(model.text_features(jnp.asarray(ids))).astype(np.float32)
    del hf

    ci = _cosine_rows(ours_img, ref_img)
    ct = _cosine_rows(ours_txt, ref_txt)
    print(f"  hf-parity cosine: image {ci.min():.6f}, text {ct.min():.6f}")
    if min(ci.min(), ct.min()) < threshold:
        print(f"  ❌ hf-parity below {threshold}")
        return False
    return True


def probe_model(name: str, weights: str, threshold: float,
                hf_parity: bool = False, parity_threshold: float = 0.999,
                checkpoint_dir: str | None = None) -> bool:
    from ..models.registry import model_info

    info = model_info(name)
    try:
        if weights == "debug":
            model = load_debug_model(info)
        elif weights == "arch":
            from ..models.arch import load_arch_model

            model = load_arch_model(name)
        else:
            model = load_model(info, checkpoint_dir=checkpoint_dir)
    except Exception as e:
        print(f"  ❌ load failed: {e}")
        return False

    if hf_parity and weights == "real":
        if not hf_parity_check(model, info, checkpoint_dir, parity_threshold):
            return False

    mesh = get_mesh()
    engine = EncodingEngine(model, mesh, batch_size=4)

    rng = np.random.default_rng(0)
    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h), np.full((h, w), 128)], -1).astype(np.uint8)
    texts = ["a colorful gradient test pattern", "a photo of a dog in the park"]

    ie = np.asarray(engine.encode_images([img]).embeddings)
    te = np.asarray(engine.encode_texts(texts).embeddings)

    def stats(x, label):
        flat = x.reshape(-1, x.shape[-1]).astype(np.float32)  # bf16-safe
        norms = np.linalg.norm(flat, axis=-1)
        nz = norms[norms > 1e-6]
        print(
            f"  {label}: shape {x.shape}, norm {nz.mean():.4f}, "
            f"mean {flat.mean():+.4f}, std {flat.std():.4f}"
        )
        return nz

    i_norms = stats(ie, "image emb")
    t_norms = stats(te, "text emb ")
    ok = bool(np.allclose(i_norms, 1.0, atol=1e-2) and np.allclose(t_norms, 1.0, atol=1e-2))
    if not ok:
        print("  ❌ embeddings not unit-norm")
        return False

    if model.multi_vector:
        from ..retrieval.scoring import late_interaction_scores

        sims = np.asarray(late_interaction_scores(te, ie))[:, 0]
        print(f"  maxsim scores: {sims}")
    else:
        sims = (te @ ie.T)[:, 0]
        print(f"  cosine sims: {sims}")
        if weights == "real" and sims.max() <= threshold:
            print(f"  ❌ max sim {sims.max():.3f} <= {threshold} (weak embeddings)")
            return False
    print("  ✅ PASS")
    return True


def main(argv=None) -> int:
    args = parse_args(argv)
    setup_logging(None)
    ok = True
    for info in get_models_to_test(args.models, 4):
        print(f"=== {info.name} ({info.hf_id}) ===")
        ok &= probe_model(
            info.name, args.weights, args.sim_threshold,
            hf_parity=args.hf_parity, parity_threshold=args.parity_threshold,
            checkpoint_dir=args.checkpoint_dir,
        )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
