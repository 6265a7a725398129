"""One-shot axon TPU health probe: real device matmul + scalar readback.

Run from the repo root (PYTHONPATH tricks break axon plugin discovery,
CLAUDE.md). Exit 0 iff a small matmul executes on a real TPU device.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    if not devs or devs[0].platform == "cpu":
        print(f"no TPU device (devices={devs})", flush=True)
        return 1
    x = jnp.ones((256, 256), jnp.bfloat16)
    s = float((x @ x).sum())
    print(f"TPU ok: {devs[0]} matmul-sum={s}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
