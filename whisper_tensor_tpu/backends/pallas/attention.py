"""Pallas flash-attention kernel for TPU.

Replaces the materialized (B,H,Sq,Skv) score tensor with an online-
softmax tiled kernel (VMEM-resident tiles, MXU matmuls, f32 running
max/sum). Used by AttentionMilli.to_jax when applicable; the jnp
einsum-softmax path remains the fallback (and XLA's own fusion is
already decent at small sequence lengths).

Round-2 extensions (VERDICT r1 weak #4; r3 NOTE: the kernel is now
OPT-IN — full-model prefill benches measured XLA faster at every shape
tried, see flash_attention_usable): GQA (Hq = g * Hkv indexed in
the grid — no repeated K/V materialization), additive masks streamed
per q-tile (broadcast over batch/heads), and ragged Sq/Skv via caller
padding with in-kernel key masking — so llama-family GQA prefill and
masked decode shapes hit the kernel.

v5e measurements (causal, bf16, vs XLA's fused attention):
  isolated op: MHA S=1024 D=64 1.25x; GQA 32/8 S=2048 parity; GQA
  shorter: 0.8-0.9x.
  FULL MODEL (r3 prefill bench, the measurement that matters): XLA
  1.86x faster at S=1024 (MFU 37.6% vs 20.1%) and 2.1x at S=2048 —
  XLA fuses surrounding ops into its attention and its materialized
  scores fit HBM fine at these lengths.
The gate therefore keeps the kernel OPT-IN (WT_PALLAS_ATTENTION_FORCE=1)
for very-long-context shapes where score materialization stops fitting;
the infrastructure (GQA grid, masks, ragged padding) remains tested.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

# enable/disable via env until broadly validated on hardware.
# Read DYNAMICALLY (not at import) so bench A/B arms can flip the
# kernel off per-trace in one process (long-context xla-vs-flash).
def _enabled() -> bool:
    return os.environ.get("WT_PALLAS_ATTENTION", "1") != "0"

# tile sizes (MXU-aligned)
BLOCK_Q = 128
BLOCK_K = 128


def _pad_to(x, mult):
    return ((x + mult - 1) // mult) * mult


import contextlib
import threading

_NO_KERNEL = threading.local()


@contextlib.contextmanager
def pallas_attention_disabled():
    """Trace-time guard: the flash kernel has no JVP/VJP rule, so code
    that will be DIFFERENTIATED (LMTrainer forwards) traces inside this
    context and takes the XLA einsum-softmax path, whose backward XLA
    derives itself."""
    prev = getattr(_NO_KERNEL, "on", False)
    _NO_KERNEL.on = True
    try:
        yield
    finally:
        _NO_KERNEL.on = prev


# trace-time usage counter: jitted programs don't reveal which
# attention path they baked in, so benches/A-B probes read (and reset)
# this after compiling an arm to assert the kernel actually engaged
TRACE_USES = 0


def flash_attention_usable(q, k, v, mask, softcap: float) -> bool:
    if getattr(_NO_KERNEL, "on", False):
        return False
    if not _enabled() or softcap > 0:
        return False
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu",):
            return False
    except Exception:
        return False
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    if Hq % Hkv != 0:
        return False
    # empirical gate, re-tuned at FULL-MODEL level (r3 prefill bench):
    # XLA's fused attention beat this kernel 1.86x at S=1024 (276.7k vs
    # 148.8k tok/s, MFU 37.4% vs 20.1%) AND 2.1x at S=2048 — the
    # earlier isolated-op 1.25x MHA win did not survive in context
    # (XLA fuses the surrounding ops into its attention). The kernel
    # stays OPT-IN (WT_PALLAS_ATTENTION_FORCE=1) for shapes where
    # XLA's materialized (B,H,Sq,Skv) scores would not fit HBM.
    if os.environ.get("WT_PALLAS_ATTENTION_FORCE") != "1":
        return False
    if v.shape[-1] != D:
        return False   # padding dispatch assumes Dv == D (see caller)
    if mask is not None:
        # stream additive masks broadcast over heads: (1|B, 1, Sq, Skv)
        if mask.dtype == np.bool_:
            return False
        mb, mh, msq, mskv = mask.shape
        if mh != 1 or mb not in (1, B) or msq != Sq or mskv != Skv:
            return False
    if D % 128 != 0 and D not in (64,):
        # the caller CAN zero-pad odd head dims (WT_PALLAS_ATTENTION_PAD=1)
        # but measured on v5e the padded kernel loses to XLA's fused
        # attention at SD shapes (15.8 vs 27.6 step/s) — default off
        if os.environ.get("WT_PALLAS_ATTENTION_PAD", "0") != "1":
            return False
    if Sq < BLOCK_Q or Skv < BLOCK_K:
        return False   # tiny shapes: XLA fusion wins, don't pad 10x
    # bf16 only: the in-kernel MXU matmul uses default precision, which
    # is exact for bf16 inputs but ~1e-2 off the f32-HIGHEST oracle for
    # f32 inputs (measured on v5e).
    if np.dtype(q.dtype) != np.dtype("bfloat16"):
        return False
    return True


def flash_attention_pos_usable(q, k, v, softcap: float) -> bool:
    """Gate for the pos-bound flash form (rank-0/rank-1 position masks
    at prefill Sq). Structure mirrors flash_attention_usable, but the
    ENGAGEMENT rule differs: this form auto-engages — without
    WT_PALLAS_ATTENTION_FORCE — once XLA's materialized f32 score
    tensor would stop fitting next to the weights (the niche measured
    on v5e: llama-8B S=8k prefill scores are f32[2,8,4,8192,8224] =
    17.2 GB > the 16 GB HBM; meanwhile at S<=2k XLA's fused attention
    beats this kernel 1.9-2.1x at model level, so small shapes keep
    the XLA path). Threshold via WT_FLASH_AUTO_BYTES (default 4 GiB:
    at 8B-scale weights, 4 GiB of f32 scores next to 8.5 GB of int8
    weights puts XLA within ~3 GB of the 16 GB HBM — engage before
    the cliff, stay off where XLA was measured faster)."""
    if getattr(_NO_KERNEL, "on", False):
        return False
    if not _enabled() or softcap > 0:
        return False
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu",):
            return False
    except Exception:
        return False
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    if Hq % Hkv != 0 or v.shape[-1] != D:
        return False
    if D % 128 != 0 and D != 64:
        return False
    if Sq < BLOCK_Q or Skv < BLOCK_K:
        return False
    if np.dtype(q.dtype) != np.dtype("bfloat16"):
        return False
    # resident K/V per grid cell (kv-head-shared across qi): must fit
    # scoped VMEM with headroom for q/out/acc tiles. Longer key axes
    # split into WT_FLASH_KV_CHUNK calls with exact stats merge, so
    # only the PER-CHUNK resident matters here.
    chunk = int(os.environ.get("WT_FLASH_KV_CHUNK", "8192"))
    if _pad_to(min(Skv, chunk), BLOCK_K) * D * 2 * 2 > 12 * 2 ** 20:
        return False
    if os.environ.get("WT_PALLAS_ATTENTION_FORCE") == "1":
        return True
    auto = int(os.environ.get("WT_FLASH_AUTO_BYTES", str(4 << 30)))
    return B * Hq * Sq * Skv * 4 > auto


def flash_attention(q, k, v, scale: float, causal: bool,
                    mask=None, pos_bound=None, interpret: bool = False,
                    carry=None, carry_out: bool = False):
    """q: (B, Hq, Sq, D); k/v: (B, Hkv, Skv, D); Hq % Hkv == 0.
    mask: optional additive (1|B, 1, Sq, Skv). Ragged Sq/Skv are padded
    here; padded keys are masked in-kernel, padded query rows sliced off.

    pos_bound: optional (B,) int32 — the rank-1 POSITION mask semantics
    of AttentionMilli (query row s of batch b sees keys j <= pos[b]+s),
    enforced ENTIRELY in-register from an SMEM scalar: no (Sq, Skv)
    mask tensor exists anywhere (the dense-mask form of the same rule
    costs a (BLOCK_Q, Skv) f32 VMEM block per q-tile, which at S=8k
    blows the 16 MB scoped-VMEM budget — measured: 16.56 MB, the
    long-context OOM this argument exists to fix). Mutually exclusive
    with `mask` and `causal`; also bounds the k-loop per (b, q-tile) so
    fully-invisible key blocks are never computed.
    Returns (B, Hq, Sq, Dv)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    global TRACE_USES
    TRACE_USES += 1
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    Dv = v.shape[3]
    rep = Hq // Hkv
    if pos_bound is not None:
        assert mask is None and not causal
        pos_bound = jnp.broadcast_to(
            jnp.asarray(pos_bound, jnp.int32).reshape(-1), (B,))

    # KV chunking: the kernel keeps one kv-head's FULL (Skv, D) K and V
    # resident in VMEM; past ~8k keys the double-buffered residents
    # exceed scoped VMEM (measured: 16k OOMs). Split the key axis into
    # WT_FLASH_KV_CHUNK-sized calls CHAINED through an in-kernel carry:
    # each chunk resumes the online softmax from the previous chunk's
    # (acc, m, l) — passed as aliased f32 arrays — and only the LAST
    # chunk normalizes. No cross-chunk math exists outside the kernel
    # (a first cut merged partials with jnp ops; its (B,Hq,Sq,1)
    # broadcast temps padded 128x on TPU — 512 MB per 4 MB of data —
    # and OOM'd HBM at 16k).
    if pos_bound is not None and carry is None and not carry_out:
        C = int(os.environ.get("WT_FLASH_KV_CHUNK", "8192"))
        if Skv > C:
            n = -(-Skv // C)
            cur = None
            for c in range(n):
                cur = flash_attention(
                    q, k[:, :, c * C:(c + 1) * C],
                    v[:, :, c * C:(c + 1) * C], scale, False,
                    pos_bound=pos_bound - c * C, interpret=interpret,
                    carry=cur, carry_out=c < n - 1)
            return cur

    Sq_p, Skv_p = _pad_to(Sq, BLOCK_Q), _pad_to(Skv, BLOCK_K)
    if Sq_p != Sq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, Sq_p - Sq), (0, 0)])
    if Skv_p != Skv:
        kpad = [(0, 0), (0, 0), (0, Skv_p - Skv), (0, 0)]
        k = jnp.pad(k, kpad)
        v = jnp.pad(v, kpad)
    if mask is not None:
        mask = mask.astype(jnp.float32)
        if mask.shape[0] != B:
            mask = jnp.broadcast_to(mask, (B,) + mask.shape[1:])
        mask = jnp.pad(mask, [(0, 0), (0, 0), (0, Sq_p - Sq),
                              (0, Skv_p - Skv)])

    grid = (B, Hq, Sq_p // BLOCK_Q)
    num_k = Skv_p // BLOCK_K
    ragged_k = Skv_p != Skv

    n_in = (3 + (1 if (mask is not None or pos_bound is not None) else 0)
            + (3 if carry is not None else 0))
    n_outs = 3 if carry_out else 1

    def kernel(*refs):
        q_ref, k_ref, v_ref = refs[:3]
        m_in_ref = refs[3] if mask is not None else None
        p_ref = (refs[3] if mask is None and pos_bound is not None
                 else None)
        ci = refs[n_in - 3:n_in] if carry is not None else None
        outs = refs[n_in:n_in + n_outs]
        o_ref = outs[0]
        om_ref, ol_ref = (outs[1], outs[2]) if carry_out else (None,
                                                               None)
        acc_ref, m_ref, l_ref = refs[n_in + n_outs:]
        qi = pl.program_id(2)
        q_blk = q_ref[0, 0].astype(jnp.float32) * scale  # (BLOCK_Q, D)
        pb = p_ref[pl.program_id(0)] if p_ref is not None else None

        if ci is not None:
            acc_ref[:] = ci[0][0, 0]
            m_ref[:] = ci[1][0, 0][:, :1]
            l_ref[:] = ci[2][0, 0][:, :1]
        else:
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(kj, _):
            k_blk = k_ref[0, 0, pl.ds(kj * BLOCK_K, BLOCK_K), :]
            v_blk = v_ref[0, 0, pl.ds(kj * BLOCK_K, BLOCK_K), :]
            s = jax.lax.dot_general(
                q_blk, k_blk.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (BQ, BK)
            if m_in_ref is not None:
                s = s + m_in_ref[0, 0, :, pl.ds(kj * BLOCK_K, BLOCK_K)]
            k_pos = kj * BLOCK_K + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK_Q, BLOCK_K), 1)
            if causal:
                q_pos = qi * BLOCK_Q + jax.lax.broadcasted_iota(
                    jnp.int32, (BLOCK_Q, BLOCK_K), 0) + (Skv - Sq)
                s = jnp.where(q_pos >= k_pos, s, -jnp.inf)
            if p_ref is not None:
                # position-mask rule, in-register: key j visible to
                # query row s iff j <= pos[b] + s
                q_row = qi * BLOCK_Q + jax.lax.broadcasted_iota(
                    jnp.int32, (BLOCK_Q, BLOCK_K), 0)
                s = jnp.where(k_pos <= pb + q_row, s, -jnp.inf)
            if ragged_k:
                s = jnp.where(k_pos < Skv, s, -jnp.inf)
            m_prev = m_ref[:]
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            # guard fully-masked rows
            m_safe = jnp.where(jnp.isinf(m_cur), 0.0, m_cur)
            p = jnp.exp(s - m_safe)
            p = jnp.where(jnp.isinf(m_cur) | jnp.isinf(s), 0.0, p)
            alpha = jnp.exp(jnp.where(jnp.isinf(m_prev), -jnp.inf, m_prev) - m_safe)
            alpha = jnp.where(jnp.isinf(m_prev), 0.0, alpha)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = m_cur
            return 0

        if causal:
            # skip key blocks strictly above the diagonal
            max_kj = (qi * BLOCK_Q + BLOCK_Q + (Skv - Sq) + BLOCK_K - 1) // BLOCK_K
            max_kj = jnp.minimum(max_kj, num_k)
        elif p_ref is not None:
            # last visible key for this q-tile: pos[b] + (last row)
            last_j = pb + qi * BLOCK_Q + (BLOCK_Q - 1)
            max_kj = jnp.minimum((last_j + BLOCK_K) // BLOCK_K, num_k)
        else:
            max_kj = num_k
        jax.lax.fori_loop(0, max_kj, body, 0)
        if carry_out:
            # raw partial: un-normalized f32 acc + stats with a
            # trailing lane dim of 8 (Mosaic wants the last two block
            # dims (8,128)-aligned or array-equal; (1,1,BQ) is neither)
            o_ref[0, 0] = acc_ref[:]
            om_ref[0, 0] = jnp.broadcast_to(m_ref[:], (BLOCK_Q, 8))
            ol_ref[0, 0] = jnp.broadcast_to(l_ref[:], (BLOCK_Q, 8))
        else:
            denom = jnp.where(l_ref[:] == 0.0, 1.0, l_ref[:])
            o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, 1, BLOCK_Q, D), lambda b, h, qi: (b, h, qi, 0),
                     memory_space=pltpu.VMEM),
        # GQA: kv head = query head // rep — indexed, never materialized
        pl.BlockSpec((1, 1, Skv_p, D), lambda b, h, qi: (b, h // rep, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Skv_p, Dv), lambda b, h, qi: (b, h // rep, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if mask is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, BLOCK_Q, Skv_p), lambda b, h, qi: (b, 0, qi, 0),
            memory_space=pltpu.VMEM))
        args.append(mask)
    elif pos_bound is not None:
        # Mosaic requires rank-1 SMEM blocks to cover the whole array;
        # the kernel indexes its batch row via program_id(0)
        in_specs.append(pl.BlockSpec((B,), lambda b, h, qi: (0,),
                                     memory_space=pltpu.SMEM))
        args.append(pos_bound)

    acc_spec = pl.BlockSpec((1, 1, BLOCK_Q, Dv),
                            lambda b, h, qi: (b, h, qi, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, BLOCK_Q, 8),
                             lambda b, h, qi: (b, h, qi, 0),
                             memory_space=pltpu.VMEM)
    aliases = {}
    if carry is not None:
        in_specs += [acc_spec, stat_spec, stat_spec]
        args += list(carry)
        if carry_out and not interpret:
            # thread the chunk carry through ONE set of HBM buffers
            base = n_in - 3
            aliases = {base: 0, base + 1: 1, base + 2: 2}
    if carry_out:
        out_specs = [acc_spec, stat_spec, stat_spec]
        out_shape = [
            jax.ShapeDtypeStruct((B, Hq, Sq_p, Dv), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, Sq_p, 8), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, Sq_p, 8), jnp.float32)]
    else:
        out_specs = pl.BlockSpec((1, 1, BLOCK_Q, Dv),
                                 lambda b, h, qi: (b, h, qi, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, Hq, Sq_p, Dv), q.dtype)

    # Mosaic cannot legalize i64 index-map returns; stay 32-bit in-kernel.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=aliases,
            scratch_shapes=[
                pltpu.VMEM((BLOCK_Q, Dv), jnp.float32),
                pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
                pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            ],
        )(*args)
    if carry_out:
        return tuple(out)
    if Sq_p != Sq:
        out = out[:, :, :Sq]
    return out
