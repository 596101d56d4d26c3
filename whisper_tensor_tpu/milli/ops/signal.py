"""STFT milli op (ONNX opset-17 semantics).

Reference equivalent: the Stft symbolic op. Output layout
(batch, frames, dft_unique_bins, 2) with [..., 0]=real, [..., 1]=imag.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ...dtype import DType
from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp


@dataclass
class StftMilli(MilliOp):
    """inputs: signal(B, L) or (B, L, 1), frame_step()[, window(W), frame_length()]."""

    onesided: bool = True
    KIND = "Stft"

    def _frames(self, L, step, flen):
        return 1 + (L - flen) // step

    def eval(self, inputs):
        sig = inputs[0]
        step = int(np.asarray(inputs[1]).reshape(()))
        window = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        flen = (int(np.asarray(inputs[3]).reshape(()))
                if len(inputs) > 3 and inputs[3] is not None
                else (window.shape[0] if window is not None else None))
        squeeze_last = sig.ndim == 3
        if squeeze_last:
            sig = sig[..., 0]
        B, L = sig.shape
        if flen is None:
            flen = L
        w = window.astype(np.float64) if window is not None else np.ones(flen)
        nf = self._frames(L, step, flen)
        idx = np.arange(flen)[None, :] + step * np.arange(nf)[:, None]
        frames = sig.astype(np.float64)[:, idx] * w  # (B, nf, flen)
        if self.onesided:
            spec = np.fft.rfft(frames, n=flen, axis=-1)
        else:
            spec = np.fft.fft(frames, n=flen, axis=-1)
        out = np.stack([spec.real, spec.imag], axis=-1)
        return [out.astype(sig.dtype)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        from .shape import _need_static

        sig = inputs[0]
        step = int(np.asarray(_need_static(static, 1, "Stft")).reshape(()))
        window = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        if len(inputs) > 3 and inputs[3] is not None:
            flen = int(np.asarray(_need_static(static, 3, "Stft")).reshape(()))
        else:
            flen = window.shape[0] if window is not None else None
        if sig.ndim == 3:
            sig = sig[..., 0]
        B, L = sig.shape
        if flen is None:
            flen = L
        w = window.astype(jnp.float32) if window is not None else jnp.ones(flen, jnp.float32)
        nf = self._frames(L, step, flen)
        idx = np.arange(flen)[None, :] + step * np.arange(nf)[:, None]
        frames = sig.astype(jnp.float32)[:, jnp.asarray(idx)] * w
        if self.onesided:
            spec = jnp.fft.rfft(frames, n=flen, axis=-1)
        else:
            spec = jnp.fft.fft(frames, n=flen, axis=-1)
        out = jnp.stack([spec.real, spec.imag], axis=-1)
        return [out.astype(sig.dtype)]

    def infer(self, infos):
        vals = [i.value if i is not None and i.level is Level.NUMERIC else None
                for i in infos]
        if vals[0] is not None and all(
                v is not None for k, v in enumerate(vals[1:], 1) if infos[k] is not None):
            return [TensorInfo.numeric(self.eval(vals)[0])]
        return [TensorInfo.minimal(infos[0].dtype)]
