"""Compare tower attention implementations on the real TPU chip.

Times the full ViT-L/14-336 image forward (the benchmark's dominant phase)
at batch 64 from device-resident pixels for each --attention-impl, and
cross-checks CLS-embedding cosine between implementations.

--sweep re-measures every crossover the "auto" dispatch table encodes
(layers.attention_impl_for): ViT-H @257, SigLIP @729 image towers and the
CLIP-L/LAION-H @77 text towers — rerun after kernel changes and update
the table if a winner flips.

Usage: python benchmarks/attn_impl_bench.py [--impls xla,xla_bf16,pallas]
       [--batch 64] [--iters 4] [--colpali] [--sweep]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="xla,xla_bf16,pallas")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--colpali", action="store_true", help="also bench the Gemma/ColPali image forward")
    ap.add_argument("--colpali-batch", type=int, default=4)
    ap.add_argument("--sweep", action="store_true",
                    help="re-measure the auto-dispatch crossover shapes (ViT-H, SigLIP, text towers)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_embedding_tpu.models import layers
    from multimodal_embedding_tpu.models.arch import full_arch_config
    from multimodal_embedding_tpu.models.layers import l2_normalize
    from multimodal_embedding_tpu.models.towers import dual_encoder_init, encode_image
    from multimodal_embedding_tpu.utils.timing import hard_sync

    print(f"backend: {jax.default_backend()} x{len(jax.devices())}")

    cfg = full_arch_config("OpenAI-CLIP-L")
    params = dual_encoder_init(jax.random.key(0), cfg, jnp.bfloat16)
    b = args.batch
    px = jax.random.normal(jax.random.key(1), (b, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.bfloat16)

    s = cfg.vision.image_size // cfg.vision.patch_size
    seq = s * s + 1
    d = cfg.vision.dim
    # per-layer fwd flops: q/k/v/o projections 8*s*d^2, MLP 16*s*d^2,
    # attention logits+PV 4*s^2*d
    flops_per_img = cfg.vision.layers * (24 * seq * d * d + 4 * seq * seq * d)

    outs = {}
    for impl in args.impls.split(","):
        layers.set_attention_impl(impl)

        @jax.jit
        def fwd(p, x):
            return l2_normalize(encode_image(p, cfg, x))

        out = fwd(params, px)
        hard_sync(out)  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, px)
        hard_sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        outs[impl] = np.asarray(out, np.float32)
        tf = flops_per_img * b / dt / 1e12
        print(f"ViT-L {impl:9s}: {b / dt:7.1f} img/s  {tf:6.1f} TFLOP/s  ({dt*1e3:.1f} ms/batch)")
        fwd.clear_cache()

    base = args.impls.split(",")[0]
    for impl, o in outs.items():
        if impl == base:
            continue
        cos = float(np.mean(np.sum(o * outs[base], -1)))
        print(f"  cosine({impl}, {base}) = {cos:.6f}")

    if args.sweep:
        from multimodal_embedding_tpu.models.towers import encode_text

        def bench(label, build_fwd, params_, inp, n):
            for impl in args.impls.split(","):
                if impl == "flash":
                    continue
                layers.set_attention_impl(impl)
                fwd = jax.jit(build_fwd())
                o = fwd(params_, inp)
                hard_sync(o)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    o = fwd(params_, inp)
                hard_sync(o)
                dt = (time.perf_counter() - t0) / args.iters
                print(f"{label} {impl:9s}: {n / dt:8.1f} items/s  ({dt*1e3:.1f} ms)")
                fwd.clear_cache()

        for name, ib, tb in [("LAION-CLIP-H", 32, 256), ("SigLIP-400M", 32, 256)]:
            scfg = full_arch_config(name)
            sparams = dual_encoder_init(jax.random.key(4), scfg, jnp.bfloat16)
            spx = jax.random.normal(
                jax.random.key(5),
                (ib, scfg.vision.image_size, scfg.vision.image_size, 3),
                jnp.bfloat16,
            )
            bench(
                f"{name} image b{ib}",
                lambda scfg=scfg: (lambda p, x: l2_normalize(encode_image(p, scfg, x))),
                sparams, spx, ib,
            )
            ids = jnp.asarray(
                np.random.default_rng(0).integers(2, 30000, (tb, scfg.text.max_len)), jnp.int32
            )
            bench(
                f"{name} text  b{tb}",
                lambda scfg=scfg: (lambda p, i: l2_normalize(encode_text(p, scfg, i))),
                sparams, ids, tb,
            )
            del sparams

    if args.colpali:
        from multimodal_embedding_tpu.models.arch import full_colpali_config
        from multimodal_embedding_tpu.models.colpali import colpali_image_fwd, colpali_init

        ccfg = full_colpali_config()
        suffix_ids = np.array([2, 9, 5, 1], np.int32)  # placeholder "Describe…" ids
        cparams = colpali_init(jax.random.key(2), ccfg, suffix_ids, jnp.bfloat16)
        cb = args.colpali_batch
        cpx = jax.random.normal(
            jax.random.key(3), (cb, ccfg.vision.image_size, ccfg.vision.image_size, 3), jnp.bfloat16
        )
        couts = {}
        for impl in args.impls.split(","):
            if impl == "flash":
                continue
            layers.set_attention_impl(impl)

            @jax.jit
            def cfwd(p, x):
                return colpali_image_fwd(p, ccfg, x)

            out = cfwd(cparams, cpx)
            hard_sync(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = cfwd(cparams, cpx)
            hard_sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            couts[impl] = np.asarray(out, np.float32)
            print(f"ColPali {impl:9s}: {cb / dt:6.2f} img/s  ({dt*1e3:.1f} ms/batch of {cb})")
            cfwd.clear_cache()
        for impl, o in couts.items():
            if impl == base or base not in couts:
                continue
            a, bb = o.reshape(-1, o.shape[-1]), couts[base].reshape(-1, o.shape[-1])
            an = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-9)
            bn = bb / (np.linalg.norm(bb, axis=-1, keepdims=True) + 1e-9)
            print(f"  colpali cosine({impl}, {base}) = {float(np.mean(np.sum(an*bn,-1))):.6f}")


if __name__ == "__main__":
    main()
