"""Direct safetensors checkpoint ingestion — no torch model instantiation.

`models/hf.py` goes through `AutoModelForCausalLM.from_pretrained`, which
materialises the full torch module (2x peak RAM and slow for 7B+). This
loader reads the safetensors shards directly into the JAX param pytree:
one pass, no torch graph, dtype cast on the fly.

Supports single-file (`model.safetensors`) and sharded
(`model.safetensors.index.json`) HF checkpoints.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from modegpt_tpu.models.spec import ModelSpec, spec_from_hf_config

__all__ = ["load_hf_checkpoint_safetensors"]


class _ShardedReader:
    """Lazy tensor-name -> numpy reader over one or more shards."""

    def __init__(self, model_dir: str):
        from safetensors import safe_open

        self._open = safe_open
        index_path = os.path.join(model_dir, "model.safetensors.index.json")
        single_path = os.path.join(model_dir, "model.safetensors")
        self._files: Dict[str, str] = {}
        if os.path.exists(index_path):
            with open(index_path) as f:
                index = json.load(f)
            for name, shard in index["weight_map"].items():
                self._files[name] = os.path.join(model_dir, shard)
        elif os.path.exists(single_path):
            with self._open(single_path, framework="numpy") as f:
                for name in f.keys():
                    self._files[name] = single_path
        else:
            raise FileNotFoundError(f"no safetensors checkpoint in {model_dir}")
        self._handles: Dict[str, object] = {}

    def __contains__(self, name: str) -> bool:
        return name in self._files

    def keys(self):
        return self._files.keys()

    def get(self, name: str) -> np.ndarray:
        path = self._files[name]
        if path not in self._handles:
            self._handles[path] = self._open(path, framework="numpy").__enter__()
        t = self._handles[path].get_tensor(name)
        # bf16 arrives as ml_dtypes bfloat16 via numpy framework; upcast
        # later at the caller's chosen dtype.
        return t

    def close(self):
        for h in self._handles.values():
            try:
                h.__exit__(None, None, None)
            except Exception:
                pass
        self._handles.clear()


def load_hf_checkpoint_safetensors(
    model_dir: str, dtype=np.float32
) -> Tuple[ModelSpec, Dict]:
    """(spec, params) from an HF checkpoint directory, torch-free."""
    from transformers import AutoConfig

    from modegpt_tpu.models.hf import params_from_state_dict

    config = AutoConfig.from_pretrained(model_dir)
    spec = spec_from_hf_config(config)

    reader = _ShardedReader(model_dir)

    class _LazySD:
        """Duck-typed state dict backed by the shard reader."""

        def __contains__(self, name):
            return name in reader

        def __getitem__(self, name):
            # Some checkpoints omit the "model." prefix or use tied heads.
            if name in reader:
                return reader.get(name)
            raise KeyError(name)

        def keys(self):
            return reader.keys()

    try:
        params = params_from_state_dict(spec, _LazySD(), dtype=dtype)
    finally:
        reader.close()
    return spec, params
