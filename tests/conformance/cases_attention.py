"""ONNX opset-23 Attention conformance cases.

Regenerates the official corpus' attention family 1:1 by test name
(/root/reference/tests/onnx_testing.rs enumerates 93 attention cases;
the vendored corpus itself is an empty submodule in this image). Each
case name below matches the official body (sans ``test_`` prefix), and
the ``_expanded`` twins — which in the official suite run the
function-expansion of the op — re-run the same model and data.

The expected values come from a local numpy oracle written straight
from the spec's stage order (QK*scale -> +bias -> softcap -> softmax,
the qk_matmul_output_mode enum order), independent of the framework's
milli kernels.
"""

from __future__ import annotations

import numpy as np

from .harness import Case


def _softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def _oracle(q, k, v, mask=None, past_k=None, past_v=None, *, scale=None,
            causal=False, softcap=0.0, qk_mode=0, q_heads=0, kv_heads=0):
    """Spec-order SDPA. Returns (Y, present_key, present_value, qk)."""
    was_3d = q.ndim == 3
    if was_3d:
        Hq, Hkv = q_heads, (kv_heads or q_heads)
        B, Sq = q.shape[:2]
        Skv = k.shape[1]
        q = q.reshape(B, Sq, Hq, -1).transpose(0, 2, 1, 3)
        k = k.reshape(B, Skv, Hkv, -1).transpose(0, 2, 1, 3)
        v = v.reshape(B, Skv, Hkv, -1).transpose(0, 2, 1, 3)
    if past_k is not None:
        k = np.concatenate([past_k, k], axis=2)
        v = np.concatenate([past_v, v], axis=2)
    B, Hq, Sq, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    kf, vf = k, v
    if Hq != Hkv:
        kf = np.repeat(k, Hq // Hkv, axis=1)
        vf = np.repeat(v, Hq // Hkv, axis=1)
    if scale is None:
        scale = 1.0 / np.sqrt(D)
    s = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64),
                  kf.astype(np.float64)) * scale
    qk = s
    if mask is not None:
        if mask.dtype == np.bool_:
            s = np.where(mask, s, -1e30)
        else:
            s = s + mask.astype(np.float64)
    if causal:
        tri = np.tril(np.ones((Sq, S), bool), k=S - Sq)
        s = np.where(tri, s, -1e30)
    if qk_mode >= 1:
        qk = s
    if softcap > 0:
        s = softcap * np.tanh(s / softcap)
    if qk_mode >= 2:
        qk = s
    p = _softmax(s)
    if qk_mode >= 3:
        qk = p
    y = np.einsum("bhqk,bhkd->bhqd", p, vf.astype(np.float64))
    y = y.astype(np.float32)
    if was_3d:
        y = y.transpose(0, 2, 1, 3).reshape(B, Sq, -1)
    return y, k, v, qk.astype(np.float32)


def _make(name: str) -> Case:
    rng = np.random.default_rng(abs(hash(name)) % (2**31))
    toks = name.split("_")
    three_d = "3d" in toks
    gqa = "gqa" in toks
    diff = "diff" in toks          # v head size != qk head size
    has_past = "past" in toks
    causal = "causal" in toks
    bool_mask = "bool" in toks
    has_mask = ("mask" in toks and "attn" in toks) or \
        (name.endswith("qk_matmul_bias") or "qk_matmul_bias_" in name)
    softcap = 2.0 if "softcap" in toks else 0.0
    scale = 0.1 if "scaled" in toks else None
    qk_mode = None
    if "matmul" in toks:
        qk_mode = 0
        if "bias" in toks:
            qk_mode = 1
        elif "softcap" in toks:
            qk_mode = 2
        elif "softmax" in toks:
            qk_mode = 3

    B, Sq = 2, 4
    Hq = 4 if (gqa or diff or has_past) else 3
    Hkv = 2 if (gqa or ("diff" in toks and "heads" in toks)) else Hq
    D = 8
    Dv = 10 if diff else D
    if has_past:
        S_new, S_past = 2, 3
    else:
        S_new, S_past = Sq, 0
    S_total = S_new + S_past
    if not has_past:
        Sq = S_new

    def rnd(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.5

    attrs = {}
    if causal:
        attrs["is_causal"] = 1
    if softcap:
        attrs["softcap"] = softcap
    if scale is not None:
        attrs["scale"] = scale
    if qk_mode is not None:
        attrs["qk_matmul_output_mode"] = qk_mode

    if three_d:
        q = rnd(B, Sq, Hq * D)
        k = rnd(B, S_new, Hkv * D)
        v = rnd(B, S_new, Hkv * Dv)
        attrs["q_num_heads"] = Hq
        attrs["kv_num_heads"] = Hkv
    else:
        q = rnd(B, Hq, Sq, D)
        k = rnd(B, Hkv, S_new, D)
        v = rnd(B, Hkv, S_new, Dv)

    mask = None
    if has_mask:
        if bool_mask:
            # keep at least one visible key per query row
            mask = rng.random((B, 1, Sq, S_total)) > 0.3
            mask[..., 0] = True
        else:
            mask = (rng.random((B, 1, Sq, S_total)) < 0.3).astype(
                np.float32) * -1e4

    past_k = rnd(B, Hkv, S_past, D) if has_past else None
    past_v = rnd(B, Hkv, S_past, Dv) if has_past else None

    y, pk, pv, qk = _oracle(
        q, k, v, mask, past_k, past_v, scale=scale, causal=causal,
        softcap=softcap, qk_mode=qk_mode or 0, q_heads=Hq, kv_heads=Hkv)

    inputs = {"q": q, "k": k, "v": v}
    expected = [y]
    if has_past or qk_mode is not None:
        inputs["attn_mask"] = mask  # None -> empty-name slot
        expected += [pk, pv]
    elif mask is not None:
        inputs["attn_mask"] = mask
    if has_past:
        inputs["past_key"] = past_k
        inputs["past_value"] = past_v
    if qk_mode is not None:
        expected.append(qk)
    return Case(name, "Attention", inputs, expected, attrs=attrs,
                atol=1e-5)


_BODIES = [
    "attention_3d", "attention_3d_attn_mask", "attention_3d_causal",
    "attention_3d_diff_heads_sizes",
    "attention_3d_diff_heads_sizes_attn_mask",
    "attention_3d_diff_heads_sizes_causal",
    "attention_3d_diff_heads_sizes_scaled",
    "attention_3d_diff_heads_sizes_softcap",
    "attention_3d_diff_heads_with_past_and_present",
    "attention_3d_gqa", "attention_3d_gqa_attn_mask",
    "attention_3d_gqa_causal", "attention_3d_gqa_scaled",
    "attention_3d_gqa_softcap", "attention_3d_gqa_with_past_and_present",
    "attention_3d_scaled", "attention_3d_softcap",
    "attention_3d_with_past_and_present",
    "attention_3d_with_past_and_present_qk_matmul",
    "attention_3d_with_past_and_present_qk_matmul_bias",
    "attention_3d_with_past_and_present_qk_matmul_softcap",
    "attention_3d_with_past_and_present_qk_matmul_softmax",
    "attention_4d", "attention_4d_attn_mask", "attention_4d_attn_mask_bool",
    "attention_4d_causal", "attention_4d_diff_heads_sizes",
    "attention_4d_diff_heads_sizes_attn_mask",
    "attention_4d_diff_heads_sizes_causal",
    "attention_4d_diff_heads_sizes_scaled",
    "attention_4d_diff_heads_sizes_softcap",
    "attention_4d_diff_heads_with_past_and_present",
    "attention_4d_gqa", "attention_4d_gqa_attn_mask",
    "attention_4d_gqa_causal", "attention_4d_gqa_scaled",
    "attention_4d_gqa_softcap", "attention_4d_gqa_with_past_and_present",
    "attention_4d_scaled", "attention_4d_softcap",
    "attention_4d_with_past_and_present",
    "attention_4d_with_past_and_present_qk_matmul",
    "attention_4d_with_past_and_present_qk_matmul_bias",
    "attention_4d_with_qk_matmul", "attention_4d_with_qk_matmul_bias",
    "attention_4d_with_qk_matmul_softcap",
    "attention_4d_with_qk_matmul_softmax",
]

CASES = [_make(b) for b in _BODIES]
# official _expanded twins run the function-expansion of the same data
CASES += [Case(c.name + "_expanded", c.op_type, c.inputs, c.expected,
               attrs=c.attrs, atol=c.atol) for c in list(CASES)]
