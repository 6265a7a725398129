"""MaxSim kernel at the PRODUCTION full7 shapes (VERDICT r3 #7).

The r3 PERF number (72.6 TFLOPS) was measured at 2048x1024 docs with
Tq=32/Td=1056; the benchmark actually runs two different shapes on the 5k
split (reference main.py:451-470's 15-20 h path this kernel replaces):

- T2I: 5000 caption queries (Tq~26 after ColPali query wrapping) vs 5000
  image docs (Td=1030, no mask — pads zeroed by the model, COMPAT #8);
- I2T: 5000 image queries (Tq=1030 -> the chunk=64 additive split in
  ops/maxsim.py:263-284) vs 25000 caption docs (Td~26 with mask).

Measures ms + achieved TFLOPS for pallas vs the XLA reference path at both
shapes on the real chip (hard_sync timing, warmup excluded).

Usage: python benchmarks/maxsim_prod_shapes.py [--nq 5000 --nd 5000]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def bench(fn, *args, reps=3):
    from multimodal_embedding_tpu.utils.timing import hard_sync

    hard_sync(fn(*args))  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        hard_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def tflops(nq, tq, nd, td, dim, secs):
    # one fused multiply-add per (q-token, d-token, dim) pair per (q, d)
    return 2.0 * nq * nd * tq * td * dim / secs / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=5000)
    ap.add_argument("--nd", type=int, default=5000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--tq-t2i", type=int, default=26)
    ap.add_argument("--td-img", type=int, default=1030)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_embedding_tpu.ops.maxsim import maxsim_scores, maxsim_scores_ref
    from multimodal_embedding_tpu.utils.timing import hard_sync

    dim = args.dim

    def dev_normal(key, shape):
        # fixtures are generated ON DEVICE: a multi-GB host put over the
        # tunnel is both slow and wedge-prone (CLAUDE.md)
        x = jax.random.normal(jax.random.key(key), shape, jnp.float32)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return hard_sync(x.astype(jnp.bfloat16))

    def dev_mask(key, shape):
        return hard_sync(jax.random.uniform(jax.random.key(key), shape) < 0.9)

    # T2I: caption queries vs image docs
    q = dev_normal(0, (args.nq, args.tq_t2i, dim))
    qm = dev_mask(1, (args.nq, args.tq_t2i))
    d_img = dev_normal(2, (args.nd, args.td_img, dim))

    for impl in ("pallas", "xla"):
        fn = (lambda a, b, m: maxsim_scores(a, b, m, impl="pallas")) if impl == "pallas" else (
            lambda a, b, m: maxsim_scores_ref(a, b, m)
        )
        s = bench(fn, q, d_img, qm, reps=args.reps)
        print(
            f"T2I  {impl:6s} nq={args.nq} tq={args.tq_t2i} nd={args.nd} "
            f"td={args.td_img}: {s*1e3:8.1f} ms  "
            f"{tflops(args.nq, args.tq_t2i, args.nd, args.td_img, dim, s):6.1f} TFLOPS",
            flush=True,
        )

    # I2T: image queries (1030 tokens -> chunk=64 additive split) vs 5*nd caption docs
    del q, d_img
    q_img = dev_normal(3, (args.nq, args.td_img, dim))
    d_cap = dev_normal(4, (5 * args.nd, args.tq_t2i, dim))
    dm = dev_mask(5, (5 * args.nd, args.tq_t2i))

    for impl in ("pallas", "xla"):
        fn = (
            lambda a, b, m: maxsim_scores(a, b, None, m, impl="pallas")
        ) if impl == "pallas" else (lambda a, b, m: maxsim_scores_ref(a, b, None, m))
        s = bench(fn, q_img, d_cap, dm, reps=args.reps)
        print(
            f"I2T  {impl:6s} nq={args.nq} tq={args.td_img} nd={5*args.nd} "
            f"td={args.tq_t2i}: {s*1e3:8.1f} ms  "
            f"{tflops(args.nq, args.td_img, 5 * args.nd, args.tq_t2i, dim, s):6.1f} TFLOPS",
            flush=True,
        )


if __name__ == "__main__":
    main()
