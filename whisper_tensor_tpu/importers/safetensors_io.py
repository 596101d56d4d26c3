"""Lazy safetensors weight manager.

Reference equivalent: the mmap'd SafetensorsWeightManager
(crates/whisper-tensor-import/src/onnx_graph/weights.rs). Uses the
baked-in `safetensors` package for zero-copy lazy slices; multi-shard
checkpoints (model.safetensors.index.json) are resolved transparently.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from ..dtype import DType


class SafetensorsStore:
    """name -> lazy numpy loader over one or many .safetensors files."""

    def __init__(self, paths: List[str]):
        self.paths = list(paths)
        self._by_name: Dict[str, str] = {}
        from safetensors import safe_open

        self._handles: Dict[str, object] = {}
        for p in self.paths:
            with safe_open(p, framework="numpy") as f:
                for k in f.keys():
                    self._by_name[k] = p

    @staticmethod
    def from_dir(d: str) -> "SafetensorsStore":
        idx = os.path.join(d, "model.safetensors.index.json")
        if os.path.exists(idx):
            with open(idx) as f:
                meta = json.load(f)
            shards = sorted(set(meta["weight_map"].values()))
            return SafetensorsStore([os.path.join(d, s) for s in shards])
        single = os.path.join(d, "model.safetensors")
        if os.path.exists(single):
            return SafetensorsStore([single])
        files = sorted(f for f in os.listdir(d) if f.endswith(".safetensors"))
        if not files:
            raise FileNotFoundError(f"no safetensors in {d}")
        return SafetensorsStore([os.path.join(d, f) for f in files])

    def names(self):
        return self._by_name.keys()

    def __contains__(self, name):
        return name in self._by_name

    def load(self, name: str) -> np.ndarray:
        from safetensors import safe_open

        p = self._by_name[name]
        with safe_open(p, framework="numpy") as f:
            return f.get_tensor(name)

    def getter(self, transform: Optional[Callable[[str, np.ndarray], np.ndarray]] = None
               ) -> Callable[[str], np.ndarray]:
        def get(name: str) -> np.ndarray:
            arr = self.load(name)
            return transform(name, arr) if transform else arr

        return get

    def meta(self, name: str):
        """(shape, numpy dtype) from the safetensors header — no data read."""
        from safetensors import safe_open

        p = self._by_name[name]
        with safe_open(p, framework="numpy") as f:
            sl = f.get_slice(name)
            shape = tuple(sl.get_shape())
            dt = str(sl.get_dtype()).lower()
        np_dt = {"f64": np.float64, "f32": np.float32, "f16": np.float16,
                 "bf16": "bfloat16", "i64": np.int64, "i32": np.int32,
                 "i16": np.int16, "i8": np.int8, "u8": np.uint8,
                 "bool": np.bool_}.get(dt, np.float32)
        if np_dt == "bfloat16":
            import ml_dtypes

            np_dt = ml_dtypes.bfloat16
        return shape, np.dtype(np_dt)

    def lazy(self, name: str):
        """Origin-bearing LazyWeight for WeightStorage.origin_reference():
        carries the safetensors file path + tensor name so an exported
        ONNX can point back at this checkpoint instead of embedding the
        payload (reference OriginReferenceOutputManager,
        onnx_graph/weights.rs:263-282)."""
        from ..dtype import DType
        from .onnx_builder import LazyWeight

        shape, np_dt = self.meta(name)
        return LazyWeight(
            lambda: self.load(name), DType.from_numpy(np_dt), shape,
            origin={"format": "safetensors", "tensor_name": name,
                    "location": os.path.abspath(self._by_name[name])})

    def zeros_getter(self) -> Callable[[str], np.ndarray]:
        """Shape-faithful zero arrays (header metadata only) — for
        building structure-only graph variants (WeightStorage.none) that
        share a real TensorStore afterwards."""

        def get(name: str) -> np.ndarray:
            shape, dt = self.meta(name)
            return np.zeros(shape, dtype=dt)

        return get


def load_hf_config(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)
