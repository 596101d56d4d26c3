"""Random milli ops (seeded, reproducible across backends where possible)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ...dtype import DType
from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp


@dataclass
class RandomNormalLike(MilliOp):
    mean: float = 0.0
    scale: float = 1.0
    seed: Optional[int] = None
    dtype: Optional[DType] = None
    KIND = "RandomNormalLike"

    def eval(self, inputs):
        x = inputs[0]
        dt = (self.dtype or DType.from_numpy(x.dtype)).to_numpy()
        rng = np.random.default_rng(None if self.seed is None else int(self.seed))
        return [rng.normal(self.mean, self.scale, size=x.shape).astype(dt)]

    def to_jax(self, inputs, static=None):
        import jax

        x = inputs[0]
        dt = (self.dtype or DType.from_numpy(np.dtype(x.dtype))).to_jax()
        key = jax.random.PRNGKey(0 if self.seed is None else int(self.seed))
        out = jax.random.normal(key, x.shape, dtype=jax.numpy.float32)
        return [(out * self.scale + self.mean).astype(dt)]

    def infer(self, infos):
        i = infos[0]
        dt = self.dtype or i.dtype
        return [TensorInfo(dt, min(i.level, Level.SHAPED), shape=i.shape, rank_=i.rank_)]
