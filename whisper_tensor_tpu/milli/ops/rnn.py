"""LSTM milli op (ONNX LSTM semantics; iofc gate order).

Reference equivalent: the Lstm symbolic op (src/symbolic_graph/ops/
mod.rs:223-286). Oracle: numpy time loop; XLA: lax.scan (compiles to a
single fused while-loop on TPU).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ...dtype import DType
from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def _f32_matmuls(fn):
    """RNN jax paths compute in f32; trace their matmuls at
    Precision.HIGHEST so the MXU doesn't truncate f32 operands to bf16
    (same per-op rule as MatMul/Einsum/conv — scoped here because the
    recurrences use the `@` operator throughout)."""
    import functools

    @functools.wraps(fn)
    def wrapped(self, inputs, static=None):
        import jax

        with jax.default_matmul_precision("highest"):
            return fn(self, inputs, static)
    return wrapped


@dataclass
class LstmMilli(MilliOp):
    """inputs: X(S,B,I), W(nd,4H,I), R(nd,4H,H)[, B(nd,8H), seq_lens(B),
    initial_h(nd,B,H), initial_c(nd,B,H)].
    outputs: Y(S,nd,B,H), Y_h(nd,B,H), Y_c(nd,B,H)."""

    hidden_size: int = 0
    direction: str = "forward"  # forward | reverse | bidirectional
    layout: int = 0             # 1 = batch-first (batchwise tests)
    KIND = "Lstm"
    N_OUTPUTS = 3

    def _dirs(self):
        if self.direction == "bidirectional":
            return [0, 1]
        return [1] if self.direction == "reverse" else [0]

    def eval(self, inputs):
        X = inputs[0].astype(np.float32)
        if self.layout:
            X = np.swapaxes(X, 0, 1)
        W = inputs[1].astype(np.float32)
        R = inputs[2].astype(np.float32)
        Bi = inputs[3].astype(np.float32) if len(inputs) > 3 and inputs[3] is not None else None
        seq_lens = inputs[4] if len(inputs) > 4 and inputs[4] is not None else None
        H = self.hidden_size
        S, Bn, I = X.shape
        nd = W.shape[0]
        h0 = (inputs[5].astype(np.float32) if len(inputs) > 5 and inputs[5] is not None
              else np.zeros((nd, Bn, H), np.float32))
        c0 = (inputs[6].astype(np.float32) if len(inputs) > 6 and inputs[6] is not None
              else np.zeros((nd, Bn, H), np.float32))
        if self.layout and len(inputs) > 5 and inputs[5] is not None:
            h0 = np.swapaxes(h0, 0, 1)
        if self.layout and len(inputs) > 6 and inputs[6] is not None:
            c0 = np.swapaxes(c0, 0, 1)
        P = (inputs[7].astype(np.float32)
             if len(inputs) > 7 and inputs[7] is not None else None)
        Y = np.zeros((S, nd, Bn, H), np.float32)
        Yh = np.zeros((nd, Bn, H), np.float32)
        Yc = np.zeros((nd, Bn, H), np.float32)
        for d in range(nd):
            rev = (self.direction == "reverse") or (d == 1)
            Wd, Rd = W[d], R[d]
            bias = Bi[d][:4 * H] + Bi[d][4 * H:] if Bi is not None else np.zeros(4 * H, np.float32)
            pi = P[d][0:H] if P is not None else 0.0
            po = P[d][H:2 * H] if P is not None else 0.0
            pf = P[d][2 * H:3 * H] if P is not None else 0.0
            h, c = h0[d].copy(), c0[d].copy()
            order = range(S - 1, -1, -1) if rev else range(S)
            for t in order:
                x = X[t]
                g = x @ Wd.T + h @ Rd.T + bias
                i = _sig(g[:, 0:H] + pi * c)
                f = _sig(g[:, 2 * H:3 * H] + pf * c)
                cc = np.tanh(g[:, 3 * H:4 * H])
                c_new = f * c + i * cc
                o = _sig(g[:, H:2 * H] + po * c_new)
                h_new = o * np.tanh(c_new)
                if seq_lens is not None:
                    active = (t < np.asarray(seq_lens).astype(np.int64))[:, None]
                    h_new = np.where(active, h_new, h)
                    c_new = np.where(active, c_new, c)
                    Y[t, d] = np.where(active, h_new, 0.0)
                else:
                    Y[t, d] = h_new
                h, c = h_new, c_new
            Yh[d], Yc[d] = h, c
        dt = inputs[0].dtype
        if self.layout:
            # layout=1: Y (B,S,nd,H); Y_h/Y_c (B,nd,H)
            return [Y.transpose(2, 0, 1, 3).astype(dt),
                    np.swapaxes(Yh, 0, 1).astype(dt),
                    np.swapaxes(Yc, 0, 1).astype(dt)]
        return [Y.astype(dt), Yh.astype(dt), Yc.astype(dt)]

    @_f32_matmuls
    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        X = inputs[0].astype(jnp.float32)
        W = inputs[1].astype(jnp.float32)
        R = inputs[2].astype(jnp.float32)
        if self.layout or (len(inputs) > 7 and inputs[7] is not None):
            # batch-first layout / peephole forms are corpus artifacts:
            # oracle path (recipes use the standard S-major surface)
            raise NotImplementedError("LSTM layout=1 / peepholes")
        Bi = inputs[3].astype(jnp.float32) if len(inputs) > 3 and inputs[3] is not None else None
        seq_lens = (inputs[4].astype(jnp.int64)
                    if len(inputs) > 4 and inputs[4] is not None else None)
        H = self.hidden_size
        S, Bn, I = X.shape
        nd = W.shape[0]
        h0 = (inputs[5].astype(jnp.float32) if len(inputs) > 5 and inputs[5] is not None
              else jnp.zeros((nd, Bn, H), jnp.float32))
        c0 = (inputs[6].astype(jnp.float32) if len(inputs) > 6 and inputs[6] is not None
              else jnp.zeros((nd, Bn, H), jnp.float32))
        outs, hs, cs = [], [], []
        for d in range(nd):
            rev = (self.direction == "reverse") or (d == 1)
            Wd, Rd = W[d], R[d]
            bias = (Bi[d][:4 * H] + Bi[d][4 * H:]) if Bi is not None else jnp.zeros(4 * H, jnp.float32)
            xseq = jnp.flip(X, axis=0) if rev else X
            tseq = (jnp.flip(jnp.arange(S), axis=0) if rev
                    else jnp.arange(S))

            def step(carry, xt):
                h, c = carry
                x, t = xt
                g = x @ Wd.T + h @ Rd.T + bias
                i = jax.nn.sigmoid(g[:, 0:H])
                o = jax.nn.sigmoid(g[:, H:2 * H])
                f = jax.nn.sigmoid(g[:, 2 * H:3 * H])
                cc = jnp.tanh(g[:, 3 * H:4 * H])
                c2 = f * c + i * cc
                h2 = o * jnp.tanh(c2)
                if seq_lens is not None:
                    # rows past their sequence length freeze state and
                    # emit zeros (matches the oracle / ONNX semantics)
                    active = (t < seq_lens)[:, None]
                    h2 = jnp.where(active, h2, h)
                    c2 = jnp.where(active, c2, c)
                    y = jnp.where(active, h2, 0.0)
                else:
                    y = h2
                return (h2, c2), y

            (hT, cT), ys = jax.lax.scan(step, (h0[d], c0[d]), (xseq, tseq))
            if rev:
                ys = jnp.flip(ys, axis=0)
            outs.append(ys)
            hs.append(hT)
            cs.append(cT)
        dt = inputs[0].dtype
        Y = jnp.stack(outs, axis=1).astype(dt)
        return [Y, jnp.stack(hs, axis=0).astype(dt), jnp.stack(cs, axis=0).astype(dt)]

    def infer(self, infos):
        vals = [i.value if i is not None and i.level is Level.NUMERIC else None
                for i in infos]
        if all(v is not None for v in vals[:3]) and all(
                v is not None or infos[k] is None for k, v in enumerate(vals)):
            try:
                outs = self.eval([v for v in vals])
                return [TensorInfo.numeric(o) for o in outs]
            except Exception:
                pass
        x = infos[0]
        dx = x.dims()
        nd = 2 if self.direction == "bidirectional" else 1
        H = self.hidden_size
        if getattr(self, "layout", 0):
            # batch-first layout transposes S/B in the outputs: RANKED
            n_out = getattr(self, "N_OUTPUTS", 2)
            return ([TensorInfo.ranked(x.dtype, 4)]
                    + [TensorInfo.ranked(x.dtype, 3)] * (n_out - 1))
        if dx is not None:
            from ...scalar_info import ScalarInfo

            S, Bn = dx[0], dx[1]
            return [TensorInfo.shaped(x.dtype, [S, ScalarInfo.of(nd), Bn, ScalarInfo.of(H)]),
                    TensorInfo.shaped(x.dtype, [ScalarInfo.of(nd), Bn, ScalarInfo.of(H)]),
                    TensorInfo.shaped(x.dtype, [ScalarInfo.of(nd), Bn, ScalarInfo.of(H)])]
        return [TensorInfo.minimal(x.dtype)] * 3


@dataclass
class GruMilli(MilliOp):
    """ONNX GRU (zrh gate order, linear_before_reset attr).
    inputs: X(S,B,I), W(nd,3H,I), R(nd,3H,H)[, B(nd,6H), seq_lens(B),
    initial_h(nd,B,H)].  outputs: Y(S,nd,B,H), Y_h(nd,B,H)."""

    hidden_size: int = 0
    direction: str = "forward"
    linear_before_reset: bool = False
    layout: int = 0             # 1 = batch-first (batchwise tests)
    KIND = "Gru"
    N_OUTPUTS = 2

    def _cell_np(self, x, h, Wd, Rd, wb, rb):
        H = self.hidden_size
        gx = x @ Wd.T + wb
        gh = h @ Rd.T + rb
        z = _sig(gx[:, 0:H] + gh[:, 0:H])
        r = _sig(gx[:, H:2 * H] + gh[:, H:2 * H])
        if self.linear_before_reset:
            hh = np.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        else:
            hh = np.tanh(gx[:, 2 * H:] + (r * h) @ Rd[2 * H:].T
                         + rb[2 * H:])
        return (1 - z) * hh + z * h

    def eval(self, inputs):
        X = inputs[0].astype(np.float32)
        if self.layout:
            X = np.swapaxes(X, 0, 1)
        W = inputs[1].astype(np.float32)
        R = inputs[2].astype(np.float32)
        Bi = (inputs[3].astype(np.float32)
              if len(inputs) > 3 and inputs[3] is not None else None)
        seq_lens = (inputs[4] if len(inputs) > 4 and inputs[4] is not None
                    else None)
        H = self.hidden_size
        S, Bn, I = X.shape
        nd = W.shape[0]
        h0 = (inputs[5].astype(np.float32)
              if len(inputs) > 5 and inputs[5] is not None
              else np.zeros((nd, Bn, H), np.float32))
        if self.layout and len(inputs) > 5 and inputs[5] is not None:
            h0 = np.swapaxes(h0, 0, 1)
        Y = np.zeros((S, nd, Bn, H), np.float32)
        Yh = np.zeros((nd, Bn, H), np.float32)
        for d in range(nd):
            rev = (self.direction == "reverse") or (d == 1)
            wb = Bi[d][:3 * H] if Bi is not None else np.zeros(3 * H, np.float32)
            rb = Bi[d][3 * H:] if Bi is not None else np.zeros(3 * H, np.float32)
            h = h0[d].copy()
            order = range(S - 1, -1, -1) if rev else range(S)
            for t in order:
                # note: non-linear_before_reset applies rb[2H:] inside
                # the reset product, so pass gh without it there
                if self.linear_before_reset:
                    h_new = self._cell_np(X[t], h, W[d], R[d], wb, rb)
                else:
                    gx = X[t] @ W[d].T + wb
                    gh2 = h @ R[d][:2 * H].T + rb[:2 * H]
                    z = _sig(gx[:, 0:H] + gh2[:, 0:H])
                    r = _sig(gx[:, H:2 * H] + gh2[:, H:2 * H])
                    hh = np.tanh(gx[:, 2 * H:]
                                 + (r * h) @ R[d][2 * H:].T + rb[2 * H:])
                    h_new = (1 - z) * hh + z * h
                if seq_lens is not None:
                    active = (t < np.asarray(seq_lens).astype(np.int64))[:, None]
                    h_new = np.where(active, h_new, h)
                    Y[t, d] = np.where(active, h_new, 0.0)
                else:
                    Y[t, d] = h_new
                h = h_new
            Yh[d] = h
        dt = inputs[0].dtype
        if self.layout:
            return [Y.transpose(2, 0, 1, 3).astype(dt),
                    np.swapaxes(Yh, 0, 1).astype(dt)]
        return [Y.astype(dt), Yh.astype(dt)]

    @_f32_matmuls
    def to_jax(self, inputs, static=None):
        if self.layout:
            raise NotImplementedError("GRU layout=1 (oracle path)")
        import jax
        import jax.numpy as jnp

        X = inputs[0].astype(jnp.float32)
        W = inputs[1].astype(jnp.float32)
        R = inputs[2].astype(jnp.float32)
        Bi = (inputs[3].astype(jnp.float32)
              if len(inputs) > 3 and inputs[3] is not None else None)
        seq_lens = (inputs[4].astype(jnp.int64)
                    if len(inputs) > 4 and inputs[4] is not None else None)
        H = self.hidden_size
        S, Bn, I = X.shape
        nd = W.shape[0]
        h0 = (inputs[5].astype(jnp.float32)
              if len(inputs) > 5 and inputs[5] is not None
              else jnp.zeros((nd, Bn, H), jnp.float32))
        outs, hs = [], []
        for d in range(nd):
            rev = (self.direction == "reverse") or (d == 1)
            Wd, Rd = W[d], R[d]
            wb = Bi[d][:3 * H] if Bi is not None else jnp.zeros(3 * H, jnp.float32)
            rb = Bi[d][3 * H:] if Bi is not None else jnp.zeros(3 * H, jnp.float32)
            xseq = jnp.flip(X, axis=0) if rev else X
            tseq = jnp.flip(jnp.arange(S), axis=0) if rev else jnp.arange(S)

            def step(h, xt, Wd=Wd, Rd=Rd, wb=wb, rb=rb):
                x, t = xt
                gx = x @ Wd.T + wb
                z = jax.nn.sigmoid(gx[:, 0:H] + h @ Rd[0:H].T + rb[0:H])
                r = jax.nn.sigmoid(gx[:, H:2 * H] + h @ Rd[H:2 * H].T
                                   + rb[H:2 * H])
                if self.linear_before_reset:
                    hh = jnp.tanh(gx[:, 2 * H:]
                                  + r * (h @ Rd[2 * H:].T + rb[2 * H:]))
                else:
                    hh = jnp.tanh(gx[:, 2 * H:]
                                  + (r * h) @ Rd[2 * H:].T + rb[2 * H:])
                h2 = (1 - z) * hh + z * h
                if seq_lens is not None:
                    active = (t < seq_lens)[:, None]
                    h2 = jnp.where(active, h2, h)
                    y = jnp.where(active, h2, 0.0)
                else:
                    y = h2
                return h2, y

            hT, ys = jax.lax.scan(step, h0[d], (xseq, tseq))
            if rev:
                ys = jnp.flip(ys, axis=0)
            outs.append(ys)
            hs.append(hT)
        dt = inputs[0].dtype
        return [jnp.stack(outs, axis=1).astype(dt),
                jnp.stack(hs, axis=0).astype(dt)]

    def infer(self, infos):
        x = infos[0]
        dx = x.dims()
        nd = 2 if self.direction == "bidirectional" else 1
        H = self.hidden_size
        if getattr(self, "layout", 0):
            # batch-first layout transposes S/B in the outputs: RANKED
            n_out = getattr(self, "N_OUTPUTS", 2)
            return ([TensorInfo.ranked(x.dtype, 4)]
                    + [TensorInfo.ranked(x.dtype, 3)] * (n_out - 1))
        if dx is not None:
            from ...scalar_info import ScalarInfo

            S, Bn = dx[0], dx[1]
            return [TensorInfo.shaped(x.dtype, [S, ScalarInfo.of(nd), Bn,
                                                ScalarInfo.of(H)]),
                    TensorInfo.shaped(x.dtype, [ScalarInfo.of(nd), Bn,
                                                ScalarInfo.of(H)])]
        return [TensorInfo.minimal(x.dtype)] * 2


@dataclass
class RnnMilli(MilliOp):
    """ONNX vanilla RNN: h' = act(W x + R h + Wb + Rb)."""

    hidden_size: int = 0
    direction: str = "forward"
    activation: str = "tanh"   # tanh | relu
    layout: int = 0
    KIND = "Rnn"
    N_OUTPUTS = 2

    def _act_np(self, v):
        return np.tanh(v) if self.activation == "tanh" else np.maximum(v, 0)

    def eval(self, inputs):
        X = inputs[0].astype(np.float32)
        if self.layout:
            X = np.swapaxes(X, 0, 1)
        W = inputs[1].astype(np.float32)
        R = inputs[2].astype(np.float32)
        Bi = (inputs[3].astype(np.float32)
              if len(inputs) > 3 and inputs[3] is not None else None)
        seq_lens = (inputs[4] if len(inputs) > 4 and inputs[4] is not None
                    else None)
        H = self.hidden_size
        S, Bn, I = X.shape
        nd = W.shape[0]
        h0 = (inputs[5].astype(np.float32)
              if len(inputs) > 5 and inputs[5] is not None
              else np.zeros((nd, Bn, H), np.float32))
        Y = np.zeros((S, nd, Bn, H), np.float32)
        Yh = np.zeros((nd, Bn, H), np.float32)
        for d in range(nd):
            rev = (self.direction == "reverse") or (d == 1)
            bias = (Bi[d][:H] + Bi[d][H:]) if Bi is not None else np.zeros(H, np.float32)
            h = h0[d].copy()
            order = range(S - 1, -1, -1) if rev else range(S)
            for t in order:
                h_new = self._act_np(X[t] @ W[d].T + h @ R[d].T + bias)
                if seq_lens is not None:
                    active = (t < np.asarray(seq_lens).astype(np.int64))[:, None]
                    h_new = np.where(active, h_new, h)
                    Y[t, d] = np.where(active, h_new, 0.0)
                else:
                    Y[t, d] = h_new
                h = h_new
            Yh[d] = h
        dt = inputs[0].dtype
        if self.layout:
            return [Y.transpose(2, 0, 1, 3).astype(dt),
                    np.swapaxes(Yh, 0, 1).astype(dt)]
        return [Y.astype(dt), Yh.astype(dt)]

    @_f32_matmuls
    def to_jax(self, inputs, static=None):
        if self.layout:
            raise NotImplementedError("RNN layout=1 (oracle path)")
        import jax
        import jax.numpy as jnp

        X = inputs[0].astype(jnp.float32)
        W = inputs[1].astype(jnp.float32)
        R = inputs[2].astype(jnp.float32)
        Bi = (inputs[3].astype(jnp.float32)
              if len(inputs) > 3 and inputs[3] is not None else None)
        seq_lens = (inputs[4].astype(jnp.int64)
                    if len(inputs) > 4 and inputs[4] is not None else None)
        H = self.hidden_size
        S, Bn, I = X.shape
        nd = W.shape[0]
        h0 = (inputs[5].astype(jnp.float32)
              if len(inputs) > 5 and inputs[5] is not None
              else jnp.zeros((nd, Bn, H), jnp.float32))
        act = jnp.tanh if self.activation == "tanh" else jax.nn.relu
        outs, hs = [], []
        for d in range(nd):
            rev = (self.direction == "reverse") or (d == 1)
            Wd, Rd = W[d], R[d]
            bias = ((Bi[d][:H] + Bi[d][H:]) if Bi is not None
                    else jnp.zeros(H, jnp.float32))
            xseq = jnp.flip(X, axis=0) if rev else X
            tseq = jnp.flip(jnp.arange(S), axis=0) if rev else jnp.arange(S)

            def step(h, xt, Wd=Wd, Rd=Rd, bias=bias):
                x, t = xt
                h2 = act(x @ Wd.T + h @ Rd.T + bias)
                if seq_lens is not None:
                    active = (t < seq_lens)[:, None]
                    h2 = jnp.where(active, h2, h)
                    y = jnp.where(active, h2, 0.0)
                else:
                    y = h2
                return h2, y

            hT, ys = jax.lax.scan(step, h0[d], (xseq, tseq))
            if rev:
                ys = jnp.flip(ys, axis=0)
            outs.append(ys)
            hs.append(hT)
        dt = inputs[0].dtype
        return [jnp.stack(outs, axis=1).astype(dt),
                jnp.stack(hs, axis=0).astype(dt)]

    def infer(self, infos):
        x = infos[0]
        dx = x.dims()
        nd = 2 if self.direction == "bidirectional" else 1
        H = self.hidden_size
        if getattr(self, "layout", 0):
            # batch-first layout transposes S/B in the outputs: RANKED
            n_out = getattr(self, "N_OUTPUTS", 2)
            return ([TensorInfo.ranked(x.dtype, 4)]
                    + [TensorInfo.ranked(x.dtype, 3)] * (n_out - 1))
        if dx is not None:
            from ...scalar_info import ScalarInfo

            S, Bn = dx[0], dx[1]
            return [TensorInfo.shaped(x.dtype, [S, ScalarInfo.of(nd), Bn,
                                                ScalarInfo.of(H)]),
                    TensorInfo.shaped(x.dtype, [ScalarInfo.of(nd), Bn,
                                                ScalarInfo.of(H)])]
        return [TensorInfo.minimal(x.dtype)] * 2
