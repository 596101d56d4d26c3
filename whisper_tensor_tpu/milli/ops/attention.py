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
    """Scaled dot-product attention (full ONNX opset-23 Attention).

    inputs: q, k, v [, mask [, past_key [, past_value]]] — None gaps
    stay positional.  4-D layout: q (B, Hq, Sq, D), k (B, Hkv, Skv, D),
    v (B, Hkv, Skv, Dv).  3-D layout (B, S, H*D) is accepted when
    q_heads is set (kv_heads for GQA); Y then comes back 3-D while the
    present outputs are always 4-D, per the ONNX spec.
    GQA: Hq may be a multiple of Hkv.  mask is additive (or boolean),
    broadcastable to (B, Hq, Sq, S_total).

    outputs (n_out of): Y, present_key, present_value, qk_matmul_output
    qk_mode selects the captured stage per ONNX qk_matmul_output_mode:
    0 = scaled QK^T, 1 = after mask/causal bias, 2 = after softcap,
    3 = after softmax.  Stage order follows the ONNX-23 reference:
    bias first, then softcap, then softmax (with 0/-inf masks this is
    numerically identical to the Gemma-2 cap-then-mask order the
    in-house recipes assume, because tanh saturates at the mask floor).

    wt extension — rank-0/rank-1 POSITION mask: an integer mask of
    shape () or (B,) is a (per-row) position; query row s of batch b
    may attend keys j <= mask[b] + s (exactly the visibility the
    recipes built as a dense Where mask from `pos`).  On TPU with
    Sq == 1 this dispatches the Pallas ragged flash-decode kernel
    (backends/pallas/decode_attention.py) which reads only each row's
    live KV prefix; at prefill Sq it dispatches the pos-bound flash
    kernel (backends/pallas/attention.py) once XLA's materialized
    scores would stop fitting HBM; everywhere else the dense boolean
    mask is synthesized and the standard paths run.
    """

    scale: Optional[float] = None
    is_causal: bool = False
    softcap: float = 0.0
    qk_mode: int = 0
    q_heads: int = 0
    kv_heads: int = 0
    n_out: int = 1
    KIND = "Attention"

    def _norm(self, xp, inputs):
        """Normalize the input surface to 4-D (q, k, v, mask, was_3d),
        concatenating past KV into k/v along the sequence axis."""
        q, k, v = inputs[0], inputs[1], inputs[2]
        mask = inputs[3] if len(inputs) > 3 else None
        past_k = inputs[4] if len(inputs) > 4 else None
        past_v = inputs[5] if len(inputs) > 5 else None
        was_3d = q.ndim == 3
        if was_3d:
            Hq = self.q_heads
            Hkv = self.kv_heads or Hq
            B, Sq = q.shape[0], q.shape[1]
            Skv = k.shape[1]
            q = xp.swapaxes(q.reshape(B, Sq, Hq, q.shape[2] // Hq), 1, 2)
            k = xp.swapaxes(k.reshape(B, Skv, Hkv, k.shape[2] // Hkv), 1, 2)
            v = xp.swapaxes(v.reshape(B, Skv, Hkv, v.shape[2] // Hkv), 1, 2)
        if past_k is not None:
            k = xp.concatenate([past_k, k], axis=2)
        if past_v is not None:
            v = xp.concatenate([past_v, v], axis=2)
        return q, k, v, mask, was_3d

    @staticmethod
    def _expand_pos_mask(xp, pos, Sq, Skv):
        """Rank-1 position mask -> dense boolean (B, 1, Sq, Skv):
        query row s of batch b sees keys j <= pos[b] + s."""
        j = xp.arange(Skv).reshape(1, 1, 1, Skv).astype(pos.dtype)
        s = xp.arange(Sq).reshape(1, 1, Sq, 1).astype(pos.dtype)
        return j <= (pos.reshape(-1, 1, 1, 1) + s)

    def eval(self, inputs):
        out_dt = inputs[0].dtype
        q, k, v, mask, was_3d = self._norm(np, inputs)
        if mask is not None and mask.ndim in (0, 1):
            mask = self._expand_pos_mask(np, np.reshape(mask, (-1,)),
                                         q.shape[2], k.shape[2])
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
        qk_out = scores
        if mask is not None:
            if mask.dtype == np.bool_:
                scores = np.where(mask, scores, np.float32(-1e30))
            else:
                scores = scores + mask.astype(np.float32)
        if self.is_causal:
            Skv = kf.shape[2]
            causal = np.tril(np.ones((Sq, Skv), dtype=bool), k=Skv - Sq)
            scores = np.where(causal, scores, np.float32(-1e30))
        if self.qk_mode >= 1:
            qk_out = scores
        if self.softcap > 0:
            scores = self.softcap * np.tanh(scores / self.softcap)
        if self.qk_mode >= 2:
            qk_out = scores
        p = _np_softmax(scores, axis=-1)
        if self.qk_mode >= 3:
            qk_out = p
        y = np.einsum("bhqk,bhkd->bhqd", p, vf).astype(out_dt)
        if was_3d:
            yB, yH, yS, yDv = y.shape
            y = np.swapaxes(y, 1, 2).reshape(yB, yS, yH * yDv)
        outs = [y, k, v, qk_out.astype(out_dt)]
        return outs[:self.n_out]

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        out_dt = inputs[0].dtype
        q, k, v, mask, was_3d = self._norm(jnp, inputs)
        pk, pv = k, v  # present_key / present_value (pre-GQA-repeat)
        B, Hq, Sq, D = q.shape
        Hkv = k.shape[1]
        scale = self.scale if self.scale is not None else 1.0 / np.sqrt(D)
        need_qk = self.n_out >= 4

        if mask is not None and mask.ndim in (0, 1):
            # rank-0/rank-1 position mask: Pallas ragged decode kernel
            # for Sq==1, pos-bound flash kernel for long prefill (the
            # bound rides SMEM — no (Sq, Skv) mask tensor ever exists;
            # at S=8k the dense form's per-q-tile mask block alone
            # blows scoped VMEM), dense synthesis otherwise
            from ...backends.pallas.attention import (
                flash_attention, flash_attention_pos_usable)
            from ...backends.pallas.decode_attention import (
                ragged_decode_attention, ragged_decode_attention_usable)

            pos_vec = (jnp.broadcast_to(mask.reshape(-1), (B,))
                       if mask.ndim == 0 else mask)
            if not need_qk and not self.softcap and not self.is_causal \
                    and ragged_decode_attention_usable(q, k, v, pos_vec):
                y = ragged_decode_attention(q, k, v, pos_vec, scale)
                if was_3d:
                    y = jnp.swapaxes(y, 1, 2).reshape(B, Sq,
                                                      Hq * y.shape[-1])
                outs = [y.astype(out_dt), pk, pv]
                return outs[:self.n_out]
            if not need_qk and not self.is_causal \
                    and flash_attention_pos_usable(q, k, v, self.softcap):
                y = flash_attention(q, k, v, scale=scale, causal=False,
                                    pos_bound=pos_vec)
                if was_3d:
                    y = jnp.swapaxes(y, 1, 2).reshape(B, Sq,
                                                      Hq * y.shape[-1])
                outs = [y.astype(out_dt), pk, pv]
                return outs[:self.n_out]
            mask = self._expand_pos_mask(jnp, pos_vec, Sq, k.shape[2])

        def finish(y, qk=None):
            if was_3d:
                y = jnp.swapaxes(y, 1, 2).reshape(B, Sq, Hq * y.shape[-1])
            outs = [y.astype(out_dt), pk, pv]
            if qk is not None:
                outs.append(qk.astype(out_dt))
            return outs[:self.n_out]

        # Pallas flash-attention fast path (TPU, no mask tensor, no softcap)
        from ...backends.pallas.attention import flash_attention_usable, flash_attention

        if not need_qk and flash_attention_usable(q, k, v, mask, self.softcap):
            # head dims the kernel can't tile (SD UNet: 40/80/160) are
            # zero-padded to the next lane multiple: zero q/k columns add
            # nothing to the scores and padded v columns are sliced away
            Dp = D if (D % 128 == 0 or D == 64) else (
                64 if D < 64 else ((D + 127) // 128) * 128)
            if Dp == D:
                return finish(flash_attention(q, k, v, scale=scale,
                                              causal=self.is_causal, mask=mask))
            pad = [(0, 0)] * 3 + [(0, Dp - D)]
            out = flash_attention(jnp.pad(q, pad), jnp.pad(k, pad),
                                  jnp.pad(v, pad), scale=scale,
                                  causal=self.is_causal, mask=mask)
            return finish(out[..., :D])

        # the grouped-GQA einsum can't expose a (B, Hq, Sq, Skv) qk
        # stage without a reshape of every intermediate — the qk-output
        # debug mode takes the plain repeat path instead (cold path)
        rep = 1 if need_qk else Hq // Hkv
        if need_qk and Hq != Hkv:
            k = jnp.repeat(k, Hq // Hkv, axis=1)
            v = jnp.repeat(v, Hq // Hkv, axis=1)
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
        qk_out = scores
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
        if self.qk_mode >= 1:
            qk_out = scores
        if self.softcap > 0:
            scores = self.softcap * jnp.tanh(scores / self.softcap)
        if self.qk_mode >= 2:
            qk_out = scores
        p = jax.nn.softmax(scores, axis=-1)
        if self.qk_mode >= 3:
            qk_out = p
        if rep > 1:
            out = jnp.einsum("bgrqk,bgkd->bgrqd", p.astype(qc.dtype), vc,
                             preferred_element_type=jnp.float32,
                             precision=prec)
            out = out.reshape(B, Hq, Sq, v.shape[-1])  # v head dim may != D
        else:
            out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(qc.dtype), vc,
                             preferred_element_type=jnp.float32,
                             precision=prec)
        return finish(out, qk_out if need_qk else None)

    def infer(self, infos):
        if all(i is None or i.level is Level.NUMERIC for i in infos) \
                and all(i is not None for i in infos[:3]):
            outs = self.eval([None if i is None else i.value for i in infos])
            return [TensorInfo.numeric(o) for o in outs]
        q, k, v = infos[0], infos[1], infos[2]
        has_past = len(infos) > 4 and infos[4] is not None
        if self.n_out == 1 and not has_past and q.rank == 4:
            dq, dv = q.dims(), v.dims()
            if dq is not None and dv is not None:
                return [TensorInfo.shaped(q.dtype, [dq[0], dq[1], dq[2], dv[3]])]
            return [TensorInfo.ranked(q.dtype, 4)]
        # multi-output / past-KV / 3-D surfaces: Y keeps q's rank, the
        # present outputs are always 4-D, the qk capture is 4-D; seq
        # dims after past-concat are left unknown (conservative lattice
        # level — validate-by-default eval accepts any lower level)
        outs = []
        if q.rank is not None:
            outs.append(TensorInfo.ranked(q.dtype, q.rank))
        else:
            outs.append(TensorInfo.minimal(q.dtype))
        if self.n_out >= 2:
            outs.append(TensorInfo.ranked(k.dtype, 4)
                        if k is not None else TensorInfo.minimal(q.dtype))
        if self.n_out >= 3:
            outs.append(TensorInfo.ranked(v.dtype, 4)
                        if v is not None else TensorInfo.minimal(q.dtype))
        if self.n_out >= 4:
            outs.append(TensorInfo.ranked(q.dtype, 4))
        return outs[:self.n_out]

    def backward(self, b, node, out_grads):
        """Recompute-based attention backward (milli training artifact):
          p = softmax(q·kᵀ·scale + mask [+ causal])
          g_v = pᵀ·g ;  g_p = g·vᵀ ;  g_s = p⊙(g_p − Σ(g_p⊙p))
          g_q = g_s·k·scale ;  g_k = g_sᵀ·q·scale
        GQA sums g_k/g_v over the query-head group (needs head counts
        from infer infos). Mask input gets no gradient (positional)."""
        g = out_grads[0]
        if g is None and not any(og is not None for og in out_grads):
            return [None] * len(node.inputs)
        if len(node.inputs) > 4 or self.q_heads or \
                any(og is not None for og in out_grads[1:]):
            raise NotImplementedError(
                "attention backward: only the 4-D q,k,v[,mask] surface "
                "with a Y gradient is differentiable (past-KV / 3-D / "
                "present-output grads are inference artifacts)")
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
        cap_deriv = None
        if self.softcap > 0:
            # ONNX-23 order: cap AFTER bias/causal. s_cap = c·tanh(s/c);
            # ds_cap/ds = 1 − tanh²(s/c) — at masked (-1e30-biased)
            # entries tanh saturates so the derivative is 0 there, which
            # is exactly right: masked scores carry no gradient.
            from .basic import SimpleUnary as _SU

            cap = b.op1(CastLike(), b.op1(Constant(
                np.asarray(self.softcap, dtype=np.float32)), phase=P), s,
                phase=P)
            th = b.op1(_SU("tanh"), bop("div", s, cap), phase=P)
            one_f = b.op1(CastLike(), b.op1(Constant(
                np.asarray(1.0, dtype=np.float32)), phase=P), s, phase=P)
            cap_deriv = bop("sub", one_f, bop("mul", th, th))
            s = bop("mul", cap, th)
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

    inputs: x (B, H, S, D) — or (B, S, H*D) when num_heads is set —
            cos (S', D/2 or D), sin (S', D/2 or D)
            [, position_ids (B, S) or (S,)]
    Without position_ids the caches may also be (B, S, D/2) per the
    ONNX-23 spec (rows already positioned).
    interleaved=False (GPT-NeoX style halves) or True (GPT-J pairs).
    rotary_dim: apply to the first `rotary_dim` features only (0 = all).
    """

    interleaved: bool = False
    rotary_dim: int = 0
    num_heads: int = 0
    KIND = "Rotary"

    def _tables(self, xp, cos, sin, pos, S):
        # select rows by positions; 3-D (B,S,half) caches come
        # pre-positioned (the ONNX-23 no-position_ids form)
        if pos is not None:
            cos = cos[pos.astype(np.int64) if isinstance(pos, np.ndarray) else pos]
            sin = sin[pos.astype(np.int64) if isinstance(pos, np.ndarray) else pos]
        elif cos.ndim == 2:
            cos = cos[:S]
            sin = sin[:S]
        return cos, sin

    def eval(self, inputs):
        x = inputs[0]
        cos, sin = inputs[1], inputs[2]
        pos = inputs[3] if len(inputs) > 3 and inputs[3] is not None else None
        out_dt = x.dtype
        xf = x.astype(np.float32)
        was_3d = xf.ndim == 3
        if was_3d:
            Bx, Sx = xf.shape[0], xf.shape[1]
            xf = np.swapaxes(xf.reshape(Bx, Sx, self.num_heads, -1), 1, 2)
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
        if was_3d:
            out = np.swapaxes(out, 1, 2).reshape(B, S, H * D)
        return [out.astype(out_dt)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x = inputs[0]
        cos, sin = inputs[1], inputs[2]
        pos = inputs[3] if len(inputs) > 3 and inputs[3] is not None else None
        xf = x.astype(jnp.float32)
        was_3d = xf.ndim == 3
        if was_3d:
            Bx, Sx = xf.shape[0], xf.shape[1]
            xf = jnp.swapaxes(xf.reshape(Bx, Sx, self.num_heads, -1), 1, 2)
        B, H, S, D = xf.shape
        rd = self.rotary_dim or D
        xr, xpass = xf[..., :rd], xf[..., rd:]
        cosf = cos.astype(jnp.float32)
        sinf = sin.astype(jnp.float32)
        if pos is not None:
            cosf = cosf[pos]
            sinf = sinf[pos]
        elif cosf.ndim == 2:
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
        if was_3d:
            out = jnp.swapaxes(out, 1, 2).reshape(B, S, H * D)
        return [out.astype(x.dtype)]

    def infer(self, infos):
        i = infos[0]
        if all(f is not None and f.level is Level.NUMERIC for f in infos):
            return [TensorInfo.numeric(self.eval([f.value for f in infos])[0])]
        return [i.forget_value()]
