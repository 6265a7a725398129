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
    return p.parse_args(argv)


def probe_model(name: str, weights: str, threshold: float) -> bool:
    from ..models.registry import model_info

    info = model_info(name)
    try:
        if weights == "debug":
            model = load_debug_model(info)
        elif weights == "arch":
            from ..models.arch import load_arch_model

            model = load_arch_model(name)
        else:
            model = load_model(info)
    except Exception as e:
        print(f"  ❌ load failed: {e}")
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
        ok &= probe_model(info.name, args.weights, args.sim_threshold)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
