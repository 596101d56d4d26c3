"""Attention + RotaryEmbedding milli ops.

These are first-class milli ops (not reduce-chain lowerings) because
they are the seam where the Pallas flash-attention kernel plugs in on
TPU (backends/pallas/attention.py); the jnp path below is the portable
XLA implementation and the numpy path is the oracle.

Reference equivalents: the RotaryEmbedding symbolic op
(src/symbolic_graph/ops/mod.rs:223-286) and the attention subgraphs the
reference's LLM recipes emit op-by-op (crates/whisper-tensor-import/
src/models/llm/*.rs) — here fused into one op so the TPU backend can
dispatch a flash kernel.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp


def _np_softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


@dataclass
class AttentionMilli(MilliOp):
    """Scaled dot-product attention.

    inputs: q (B, Hq, Sq, D), k (B, Hkv, Skv, D), v (B, Hkv, Skv, Dv)
            [, mask (additive, broadcastable to (B, Hq, Sq, Skv))]
    GQA: Hq may be a multiple of Hkv.
    """

    scale: Optional[float] = None
    is_causal: bool = False
    softcap: float = 0.0
    KIND = "Attention"

    def eval(self, inputs):
        q, k, v = inputs[0], inputs[1], inputs[2]
        mask = inputs[3] if len(inputs) > 3 and inputs[3] is not None else None
        out_dt = q.dtype
        qf = q.astype(np.float32)
        kf = k.astype(np.float32)
        vf = v.astype(np.float32)
        B, Hq, Sq, D = qf.shape
        Hkv = kf.shape[1]
        rep = Hq // Hkv
        if rep > 1:
            kf = np.repeat(kf, rep, axis=1)
            vf = np.repeat(vf, rep, axis=1)
        scale = self.scale if self.scale is not None else 1.0 / np.sqrt(D)
        scores = np.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
        if self.softcap > 0:
            scores = self.softcap * np.tanh(scores / self.softcap)
        if mask is not None:
            if mask.dtype == np.bool_:
                scores = np.where(mask, scores, np.float32(-1e30))
            else:
                scores = scores + mask.astype(np.float32)
        if self.is_causal:
            Skv = kf.shape[2]
            causal = np.tril(np.ones((Sq, Skv), dtype=bool), k=Skv - Sq)
            scores = np.where(causal, scores, np.float32(-1e30))
        p = _np_softmax(scores, axis=-1)
        out = np.einsum("bhqk,bhkd->bhqd", p, vf)
        return [out.astype(out_dt)]

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        q, k, v = inputs[0], inputs[1], inputs[2]
        mask = inputs[3] if len(inputs) > 3 and inputs[3] is not None else None
        B, Hq, Sq, D = q.shape
        Hkv = k.shape[1]
        scale = self.scale if self.scale is not None else 1.0 / np.sqrt(D)

        # Pallas flash-attention fast path (TPU, no mask tensor, no softcap)
        from ...backends.pallas.attention import flash_attention_usable, flash_attention

        if flash_attention_usable(q, k, v, mask, self.softcap):
            # head dims the kernel can't tile (SD UNet: 40/80/160) are
            # zero-padded to the next lane multiple: zero q/k columns add
            # nothing to the scores and padded v columns are sliced away
            Dp = D if (D % 128 == 0 or D == 64) else (
                64 if D < 64 else ((D + 127) // 128) * 128)
            if Dp == D:
                return [flash_attention(q, k, v, scale=scale,
                                        causal=self.is_causal, mask=mask)]
            pad = [(0, 0)] * 3 + [(0, Dp - D)]
            out = flash_attention(jnp.pad(q, pad), jnp.pad(k, pad),
                                  jnp.pad(v, pad), scale=scale,
                                  causal=self.is_causal, mask=mask)
            return [out[..., :D]]

        rep = Hq // Hkv
        # f32/f16 inputs need true-precision MXU passes to match the
        # oracle (same per-op rule as MatMul); bf16 feeds the MXU
        # DIRECTLY (exact bf16 products + f32 accumulation — identical
        # numerics to the old cast-to-f32-then-default-precision form,
        # without materializing f32 copies of the KV stream)
        if q.dtype in (jnp.float32, jnp.float64, jnp.float16):
            prec = jax.lax.Precision.HIGHEST
            qc, kc, vc = (q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32))
        else:
            prec = None
            qc, kc, vc = q, k, v
        Skv = k.shape[2]
        if rep > 1:
            # grouped GQA: batch the einsum over kv heads instead of
            # jnp.repeat'ing K/V across query heads — the repeat
            # materialized rep x the KV bytes per step and was the
            # dominant per-row decode cost at 8B scale (measured
            # ~0.33 ms/row/step, ~4x the roofline KV read)
            qg = qc.reshape(B, Hkv, rep, Sq, D)
            scores = jnp.einsum("bgrqd,bgkd->bgrqk", qg, kc,
                                preferred_element_type=jnp.float32,
                                precision=prec) * scale
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", qc, kc,
                                preferred_element_type=jnp.float32,
                                precision=prec) * scale
        if self.softcap > 0:
            scores = self.softcap * jnp.tanh(scores / self.softcap)
        if mask is not None:
            m = mask
            if rep > 1:
                if m.ndim == 4 and m.shape[1] == Hq:
                    m = m.reshape(B, Hkv, rep, *m.shape[2:])
                elif m.ndim == 4:       # broadcast head dim (1)
                    m = m[:, :, None]
            if m.dtype == jnp.bool_:
                scores = jnp.where(m, scores, jnp.float32(-1e30))
            else:
                scores = scores + m.astype(jnp.float32)
        if self.is_causal:
            causal = jnp.tril(jnp.ones((Sq, Skv), dtype=bool), k=Skv - Sq)
            scores = jnp.where(causal, scores, jnp.float32(-1e30))
        p = jax.nn.softmax(scores, axis=-1)
        if rep > 1:
            out = jnp.einsum("bgrqk,bgkd->bgrqd", p.astype(qc.dtype), vc,
                             preferred_element_type=jnp.float32,
                             precision=prec)
            out = out.reshape(B, Hq, Sq, v.shape[-1])  # v head dim may != D
        else:
            out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(qc.dtype), vc,
                             preferred_element_type=jnp.float32,
                             precision=prec)
        return [out.astype(q.dtype)]

    def infer(self, infos):
        if all(i is not None and i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        q, k, v = infos[0], infos[1], infos[2]
        dq, dv = q.dims(), v.dims()
        if dq is not None and dv is not None:
            return [TensorInfo.shaped(q.dtype, [dq[0], dq[1], dq[2], dv[3]])]
        if q.rank is not None:
            return [TensorInfo.ranked(q.dtype, q.rank)]
        return [TensorInfo.minimal(q.dtype)]

    def backward(self, b, node, out_grads):
        """Recompute-based attention backward (milli training artifact):
          p = softmax(q·kᵀ·scale + mask [+ causal])
          g_v = pᵀ·g ;  g_p = g·vᵀ ;  g_s = p⊙(g_p − Σ(g_p⊙p))
          g_q = g_s·k·scale ;  g_k = g_sᵀ·q·scale
        GQA sums g_k/g_v over the query-head group (needs head counts
        from infer infos). Mask input gets no gradient (positional)."""
        g = out_grads[0]
        if g is None:
            return [None] * len(node.inputs)
        from .basic import CastLike, Constant, MatMul, Pow, SimpleBinary
        from ..ir import Phase
        from .shape import (Concat, Expand, GatherShape, Reshape, Shape,
                            Transpose, Unsqueeze)
        from .reduce import Reduce
        from .index import Range as RangeMilli

        P = Phase.BACKWARD
        q, k, v = node.inputs[0], node.inputs[1], node.inputs[2]
        mask = node.inputs[3] if len(node.inputs) > 3 else None

        def bop(mode, *ins):
            return b.op1(SimpleBinary(mode), *ins, phase=P)

        def mm(a, c):
            return b.op1(MatMul(), a, c, phase=P)

        def tsw(t):
            return b.op1(Transpose(swap_last2=True), t, phase=P)

        def const_i64(val):
            return b.op1(Constant(np.asarray(val, dtype=np.int64)), phase=P)

        # GQA: repeat factor from infer infos (static head counts)
        qi = b.tensors[q].info
        ki = b.tensors[k].info
        rep = 1
        if qi is not None and ki is not None and qi.dims() is not None \
                and ki.dims() is not None and qi.dims()[1].is_known \
                and ki.dims()[1].is_known:
            rep = int(qi.dims()[1].value()) // int(ki.dims()[1].value())
        elif qi is not None and ki is not None:
            raise NotImplementedError(
                "attention backward: unknown head counts (run infer_all)")

        kshape = b.op1(Shape(), k, phase=P)
        kb = [b.op1(GatherShape(i), kshape, phase=P) for i in range(4)]
        if rep > 1:
            # k/v -> (B, Hkv, 1, S, D) -> expand rep -> (B, Hq, S, D)
            def rep_heads(t):
                tu = b.op1(Unsqueeze(axes=[2]), t, phase=P)
                tgt = b.op1(Concat(axis=0),
                            kb[0], kb[1], const_i64([rep]), kb[2], kb[3],
                            phase=P)
                te = b.op1(Expand(), tu, tgt, phase=P)
                hq = bop("mul", kb[1], const_i64([rep]))
                out_shape = b.op1(Concat(axis=0), kb[0], hq, kb[2], kb[3],
                                  phase=P)
                return b.op1(Reshape(), te, out_shape, phase=P)

            k_full, v_full = rep_heads(k), rep_heads(v)
        else:
            k_full, v_full = k, v

        # scale as a traced scalar: D^-0.5 (folds at trace time)
        if self.scale is not None:
            scale_t = b.op1(CastLike(), b.op1(Constant(
                np.asarray(self.scale, dtype=np.float32)), phase=P), g,
                phase=P)
        else:
            qshape = b.op1(Shape(), q, phase=P)
            d_t = b.op1(GatherShape(3), qshape, phase=P)
            d_f = b.op1(CastLike(), d_t, g, phase=P)
            neg_half = b.op1(CastLike(), b.op1(Constant(
                np.asarray(-0.5, dtype=np.float32)), phase=P), g, phase=P)
            scale_t = b.op1(Pow(), d_f, neg_half, phase=P)

        s = bop("mul", mm(q, tsw(k_full)), scale_t)
        cap_deriv = None
        if self.softcap > 0:
            # s_cap = c·tanh(s/c); ds_cap/ds = 1 − tanh²(s/c) — the mask
            # and causal terms are added AFTER the cap (Gemma-2 order),
            # so the softmax grad passes through them unchanged and only
            # the score grad picks up the tanh derivative.
            from .basic import SimpleUnary as _SU

            cap = b.op1(CastLike(), b.op1(Constant(
                np.asarray(self.softcap, dtype=np.float32)), phase=P), s,
                phase=P)
            th = b.op1(_SU("tanh"), bop("div", s, cap), phase=P)
            one_f = b.op1(CastLike(), b.op1(Constant(
                np.asarray(1.0, dtype=np.float32)), phase=P), s, phase=P)
            cap_deriv = bop("sub", one_f, bop("mul", th, th))
            s = bop("mul", cap, th)
        if mask is not None:
            s = bop("add", s, b.op1(CastLike(), mask, s, phase=P))
        if self.is_causal:
            qshape = b.op1(Shape(), q, phase=P)
            sq = b.op1(GatherShape(2), qshape, phase=P)
            skv = kb[2]
            zero = const_i64(0)
            one = const_i64(1)
            rows = b.op1(RangeMilli(), zero, sq, one, phase=P)
            cols = b.op1(RangeMilli(), zero, skv, one, phase=P)
            off = bop("sub", skv, sq)
            rows2 = b.op1(Unsqueeze(axes=[1]), bop("add", rows, off),
                          phase=P)
            cols2 = b.op1(Unsqueeze(axes=[0]), cols, phase=P)
            vis = bop("le", cols2, rows2)
            big = b.op1(CastLike(), b.op1(Constant(
                np.asarray(-1e30, dtype=np.float32)), phase=P), s, phase=P)
            zf = b.op1(CastLike(), b.op1(Constant(
                np.asarray(0.0, dtype=np.float32)), phase=P), s, phase=P)
            from .basic import Where

            s = bop("add", s, b.op1(Where(), vis, zf, big, phase=P))
        # softmax recompute
        mx = b.op1(Reduce("max", axes=[-1], keepdims=True), s, phase=P)
        from .basic import SimpleUnary

        e = b.op1(SimpleUnary("exp"), bop("sub", s, mx), phase=P)
        l = b.op1(Reduce("sum", axes=[-1], keepdims=True), e, phase=P)
        p = bop("div", e, l)

        g_v_full = mm(tsw(p), g)
        g_p = mm(g, tsw(v_full))
        inner = b.op1(Reduce("sum", axes=[-1], keepdims=True),
                      bop("mul", g_p, p), phase=P)
        g_s = bop("mul", p, bop("sub", g_p, inner))
        if cap_deriv is not None:
            g_s = bop("mul", g_s, cap_deriv)
        g_q = bop("mul", mm(g_s, k_full), scale_t)
        g_k_full = bop("mul", mm(tsw(g_s), q), scale_t)
        if rep > 1:
            # sum group gradients back to the kv heads
            def group_sum(t):
                tgt = b.op1(Concat(axis=0),
                            kb[0], kb[1], const_i64([rep]), kb[2], kb[3],
                            phase=P)
                tr = b.op1(Reshape(), t, tgt, phase=P)
                return b.op1(Reduce("sum", axes=[2], keepdims=False), tr,
                             phase=P)

            g_k, g_v = group_sum(g_k_full), group_sum(g_v_full)
        else:
            g_k, g_v = g_k_full, g_v_full
        grads = [g_q, g_k, g_v]
        if len(node.inputs) > 3:
            grads.append(None)
        return grads


@dataclass
class RotaryMilli(MilliOp):
    """Rotary position embedding.

    inputs: x (B, H, S, D), cos (S', D/2 or D), sin (S', D/2 or D)
            [, position_ids (B, S) or (S,)]
    interleaved=False (GPT-NeoX style halves) or True (GPT-J pairs).
    rotary_dim: apply to the first `rotary_dim` features only (0 = all).
    """

    interleaved: bool = False
    rotary_dim: int = 0
    KIND = "Rotary"

    def _tables(self, xp, cos, sin, pos, S):
        # select rows by positions
        if pos is not None:
            cos = cos[pos.astype(np.int64) if isinstance(pos, np.ndarray) else pos]
            sin = sin[pos.astype(np.int64) if isinstance(pos, np.ndarray) else pos]
        else:
            cos = cos[:S]
            sin = sin[:S]
        return cos, sin

    def eval(self, inputs):
        x = inputs[0]
        cos, sin = inputs[1], inputs[2]
        pos = inputs[3] if len(inputs) > 3 and inputs[3] is not None else None
        out_dt = x.dtype
        xf = x.astype(np.float32)
        B, H, S, D = xf.shape
        rd = self.rotary_dim or D
        xr, xpass = xf[..., :rd], xf[..., rd:]
        cos, sin = self._tables(xf, cos.astype(np.float32), sin.astype(np.float32), pos, S)
        # shape cos/sin to (B or 1, 1, S, rd/2)
        while cos.ndim < 3:
            cos = cos[None]
            sin = sin[None]
        cos = cos[:, None, :, :]
        sin = sin[:, None, :, :]
        half = rd // 2
        if cos.shape[-1] == rd:  # full-width tables
            cos_h, sin_h = cos[..., :half], sin[..., :half]
        else:
            cos_h, sin_h = cos, sin
        if self.interleaved:
            x1 = xr[..., 0::2]
            x2 = xr[..., 1::2]
            o1 = x1 * cos_h - x2 * sin_h
            o2 = x2 * cos_h + x1 * sin_h
            rot = np.empty_like(xr)
            rot[..., 0::2] = o1
            rot[..., 1::2] = o2
        else:
            x1 = xr[..., :half]
            x2 = xr[..., half:]
            rot = np.concatenate([x1 * cos_h - x2 * sin_h,
                                  x2 * cos_h + x1 * sin_h], axis=-1)
        out = np.concatenate([rot, xpass], axis=-1) if rd < D else rot
        return [out.astype(out_dt)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x = inputs[0]
        cos, sin = inputs[1], inputs[2]
        pos = inputs[3] if len(inputs) > 3 and inputs[3] is not None else None
        B, H, S, D = x.shape
        rd = self.rotary_dim or D
        xf = x.astype(jnp.float32)
        xr, xpass = xf[..., :rd], xf[..., rd:]
        cosf = cos.astype(jnp.float32)
        sinf = sin.astype(jnp.float32)
        if pos is not None:
            cosf = cosf[pos]
            sinf = sinf[pos]
        else:
            cosf = cosf[:S]
            sinf = sinf[:S]
        while cosf.ndim < 3:
            cosf = cosf[None]
            sinf = sinf[None]
        cosf = cosf[:, None, :, :]
        sinf = sinf[:, None, :, :]
        half = rd // 2
        if cosf.shape[-1] == rd:
            cos_h, sin_h = cosf[..., :half], sinf[..., :half]
        else:
            cos_h, sin_h = cosf, sinf
        if self.interleaved:
            x1 = xr[..., 0::2]
            x2 = xr[..., 1::2]
            o1 = x1 * cos_h - x2 * sin_h
            o2 = x2 * cos_h + x1 * sin_h
            rot = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
        else:
            x1 = xr[..., :half]
            x2 = xr[..., half:]
            rot = jnp.concatenate([x1 * cos_h - x2 * sin_h,
                                   x2 * cos_h + x1 * sin_h], axis=-1)
        out = jnp.concatenate([rot, xpass], axis=-1) if rd < D else rot
        return [out.astype(x.dtype)]

    def infer(self, infos):
        i = infos[0]
        if all(f is not None and f.level is Level.NUMERIC for f in infos):
            return [TensorInfo.numeric(self.eval([f.value for f in infos])[0])]
        return [i.forget_value()]
