"""TPU-native multimodal embedding benchmark framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference `sariekr/multimodal-embedding` benchmark (see SURVEY.md): seven
vision-language embedding models evaluated on MS-COCO Karpathy 5k (T2I / I2T /
symmetric-I2T Recall@{1,5,10}) and Winoground, with 1000-iteration bootstrap
confidence intervals, permutation tests, failure analysis, and throughput
reporting — redesigned TPU-first:

- image preprocessing is PIL-exact separable-resize matmuls on the MXU, with a
  fused Pallas kernel for the crop/normalize path (``ops.preprocess``);
- the ViT / text towers are pure-functional JAX with fused attention, loading
  HF checkpoints via ``models.convert`` (``models``);
- retrieval is sharded on-device cosine matmuls + ``lax.top_k``, and ColPali's
  multi-vector MaxSim late interaction is a tiled Pallas kernel
  (``retrieval``, ``ops.maxsim``);
- the bootstrap/statistics stage runs vmapped on device (``stats``) — the
  reference's hours-long CPU loop (main.py:586-634) becomes seconds;
- scaling is data-parallel sharding over a ``jax.sharding.Mesh`` (``parallel``).

The CLI (``cli.main``) preserves the reference ``main.py`` flags and CSV schema
exactly (reference main.py:71-80, :645-665).
"""

__version__ = "0.1.0"
