"""Winoground compositional-reasoning evaluator (reference v28:413-461).

Each of the 400 examples has two images and two captions that use the same
words in different order; the 2x2 score matrix s[c, i] (rows = captions,
cols = images — the reference's ``te @ ie.T`` orientation) yields:

    text  = s[0,0] > s[0,1] and s[1,1] > s[1,0]
    image = s[0,0] > s[1,0] and s[1,1] > s[0,1]
    group = text and image

Unlike the reference's per-pair python loop with per-pair GPU calls, all 2N
images and 2N captions are encoded in sharded batches and the predicates are
evaluated vectorized on device.
"""

from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

from ..models.encode import EncodingEngine
from ..ops.maxsim import maxsim_scores

logger = logging.getLogger("mme_tpu")


def load_winoground(sample_size: int | None = None, synthetic: bool = False, seed: int = 42):
    """Records: {'image_0','image_1': uint8 HWC, 'caption_0','caption_1': str}.

    facebook/winoground is a GATED HF dataset (the reference documents
    needing auth): the token is taken from HF_TOKEN / HUGGING_FACE_HUB_TOKEN,
    and an unauthenticated or offline load degrades to a skip-with-warning
    (empty record list -> run_winoground returns {} and the benchmark row
    simply has no Wino columns) instead of crashing the model loop.
    """
    if synthetic:
        from ..data.synthetic import synthetic_retrieval_dataset

        base = synthetic_retrieval_dataset((sample_size or 40) * 2, seed=seed)
        return [
            {
                "image_0": base[2 * i]["image"],
                "image_1": base[2 * i + 1]["image"],
                "caption_0": base[2 * i]["captions"][0],
                "caption_1": base[2 * i + 1]["captions"][0],
            }
            for i in range((sample_size or 40))
        ]
    import os

    from datasets import load_dataset

    token = os.environ.get("HF_TOKEN") or os.environ.get("HUGGING_FACE_HUB_TOKEN")
    try:
        ds = load_dataset("facebook/winoground", split="test", token=token)
    except Exception as e:
        logger.warning(
            "Winoground unavailable (gated dataset — set HF_TOKEN to "
            "authenticate); skipping: %s", e,
        )
        return []
    if sample_size is not None and sample_size < len(ds):
        ds = ds.select(range(sample_size))
    return [
        {
            "image_0": np.asarray(ex["image_0"].convert("RGB")),
            "image_1": np.asarray(ex["image_1"].convert("RGB")),
            "caption_0": ex["caption_0"],
            "caption_1": ex["caption_1"],
        }
        for ex in ds
    ]


def run_winoground(engine: EncodingEngine, records: list[dict]) -> dict[str, float]:
    """Returns {'Wino Text','Wino Image','Wino Group'} percentages."""
    n = len(records)
    if n == 0:
        return {}
    images = [r["image_0"] for r in records] + [r["image_1"] for r in records]
    texts = [r["caption_0"] for r in records] + [r["caption_1"] for r in records]

    img = engine.encode_images(images)
    txt = engine.encode_texts(texts)

    ie = img.embeddings  # [2N, ...]
    te = txt.embeddings

    if engine.model.multi_vector:
        s = maxsim_scores(te, ie)  # [2N caps, 2N imgs]
    else:
        s = jnp.dot(te.astype(jnp.float32), ie.astype(jnp.float32).T)
    s = np.asarray(s)

    idx = np.arange(n)
    s00 = s[idx, idx]  # cap0 . img0
    s01 = s[idx, idx + n]  # cap0 . img1
    s10 = s[idx + n, idx]  # cap1 . img0
    s11 = s[idx + n, idx + n]  # cap1 . img1

    text_ok = (s00 > s01) & (s11 > s10)
    image_ok = (s00 > s10) & (s11 > s01)
    group_ok = text_ok & image_ok
    return {
        "Wino Text": 100.0 * float(text_ok.mean()),
        "Wino Image": 100.0 * float(image_ok.mean()),
        "Wino Group": 100.0 * float(group_ok.mean()),
    }
