"""Native parameter checkpoints for converted models.

The reference re-runs ``from_pretrained`` (torch checkpoint load) on every
run. Here, the HF->JAX conversion result can be persisted once and reloaded
without torch/transformers: params are flattened to a single compressed .npz
(keys are '/'-joined tree paths), with the tower config serialized alongside.
Used by ``load_model(..., native_cache_dir=...)``.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import numpy as np
import jax.numpy as jnp


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def _config_to_json(cfg: Any) -> str:
    def to_jsonable(o):
        # manual recursion: dataclasses.asdict would strip the type markers
        # from NESTED dataclasses
        if dataclasses.is_dataclass(o):
            d = {"__dataclass__": type(o).__name__}
            for f in dataclasses.fields(o):
                d[f.name] = to_jsonable(getattr(o, f.name))
            return d
        if isinstance(o, tuple):
            return list(o)
        return o

    return json.dumps(to_jsonable(cfg))


_CONFIG_TYPES: dict[str, Any] = {}


def _register_config_types():
    if _CONFIG_TYPES:
        return
    from .colpali import ColPaliConfig
    from .gemma import GemmaConfig
    from .jina import Eva02Config, JinaBertConfig, JinaClipConfig
    from .qwen3 import Qwen3Config
    from .towers import DualEncoderConfig, TextConfig, VisionConfig

    for t in (ColPaliConfig, GemmaConfig, Qwen3Config, DualEncoderConfig, TextConfig,
              VisionConfig, Eva02Config, JinaBertConfig, JinaClipConfig):
        _CONFIG_TYPES[t.__name__] = t


def _config_from_json(s: str) -> Any:
    _register_config_types()

    def hook(d):
        name = d.pop("__dataclass__", None)
        if name is None:
            return d
        t = _CONFIG_TYPES[name]
        fields = {f.name for f in dataclasses.fields(t)}
        kwargs = {}
        for k, v in d.items():
            if k not in fields:
                continue
            kwargs[k] = tuple(v) if isinstance(v, list) else v
        return t(**kwargs)

    return json.loads(s, object_hook=hook)


def save_params(path: "Path | str", params: Any, cfg: Any) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    np.savez_compressed(path, __config__=np.frombuffer(
        _config_to_json(cfg).encode(), dtype=np.uint8
    ), **flat)


def load_params(path: "Path | str") -> tuple[dict, Any]:
    data = np.load(Path(path))
    cfg = _config_from_json(bytes(data["__config__"]).decode())
    flat = {k: data[k] for k in data.files if k != "__config__"}
    return _unflatten(flat), cfg
