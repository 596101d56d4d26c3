"""Pallas kernel logic tests via interpret mode (run on CPU; the real-
chip numbers live in bench logs: flash 2x faster than XLA attention at
S=1024, int8 matmul 0.2% rel err on the MXU)."""

import numpy as np
import pytest

import ml_dtypes


def _ref_attention(q, k, v, scale, causal):
    qf, kf, vf = (a.astype(np.float32) for a in (q, k, v))
    s = np.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if causal:
        Sq, Skv = q.shape[2], k.shape[2]
        mask = np.tril(np.ones((Sq, Skv), bool), k=Skv - Sq)
        s = np.where(mask, s, -np.inf)
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, vf)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_interpret(causal):
    from whisper_tensor_tpu.backends.pallas.attention import flash_attention

    rng = np.random.default_rng(0)
    B, H, S, D = 1, 2, 256, 64
    q = rng.standard_normal((B, H, S, D)).astype(ml_dtypes.bfloat16)
    k = rng.standard_normal((B, H, S, D)).astype(ml_dtypes.bfloat16)
    v = rng.standard_normal((B, H, S, D)).astype(ml_dtypes.bfloat16)
    out = np.asarray(flash_attention(q, k, v, scale=D ** -0.5, causal=causal,
                                     interpret=True)).astype(np.float32)
    ref = _ref_attention(q, k, v, D ** -0.5, causal)
    assert np.abs(out - ref).max() < 2e-2  # bf16 softmax rounding


def test_flash_gating():
    import jax.numpy as jnp

    from whisper_tensor_tpu.backends.pallas.attention import \
        flash_attention_usable

    q = jnp.zeros((1, 2, 256, 64), dtype=jnp.bfloat16)
    # off-TPU -> unusable (and f32 always unusable by policy)
    assert not flash_attention_usable(
        jnp.zeros((1, 2, 256, 64), dtype=jnp.float32), q, q, None, 0.0)


def test_int8_matmul_fallback_math():
    import jax.numpy as jnp

    from whisper_tensor_tpu.backends.pallas.quant_matmul import (int8_matmul,
                                                                 quantize_int8)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    q, s = quantize_int8(w)
    out = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s)))
    ref = x @ (q.astype(np.float32) * s[None, :])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_flash_padded_head_dim_interpret():
    """SD head dims (40/80) route through zero-padding: interpret-mode
    kernel output must match the plain XLA attention."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from whisper_tensor_tpu.backends.pallas.attention import flash_attention

    rng = np.random.default_rng(0)
    for D in (40, 80):
        q = rng.standard_normal((1, 2, 256, D)).astype(ml_dtypes.bfloat16)
        k = rng.standard_normal((1, 2, 256, D)).astype(ml_dtypes.bfloat16)
        v = rng.standard_normal((1, 2, 256, D)).astype(ml_dtypes.bfloat16)
        scale = D ** -0.5
        Dp = 64 if D < 64 else 128
        pad = [(0, 0)] * 3 + [(0, Dp - D)]
        out = flash_attention(jnp.pad(q, pad), jnp.pad(k, pad),
                              jnp.pad(v, pad), scale=scale, causal=False,
                              interpret=True)[..., :D]
        qf, kf, vf = (np.asarray(a).astype(np.float32) for a in (q, k, v))
        s = np.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("bhqk,bhkd->bhqd", p, vf)
        np.testing.assert_allclose(np.asarray(out).astype(np.float32), ref,
                                   rtol=2e-2, atol=2e-2)


def _ref_attention_gqa(q, k, v, scale, causal, mask=None):
    qf, kf, vf = (x.astype(np.float32) for x in (q, k, v))
    rep = q.shape[1] // k.shape[1]
    if rep > 1:
        kf = np.repeat(kf, rep, axis=1)
        vf = np.repeat(vf, rep, axis=1)
    s = np.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if mask is not None:
        s = s + mask.astype(np.float32)
    if causal:
        Sq, Skv = q.shape[2], k.shape[2]
        tri = np.tril(np.ones((Sq, Skv), bool), k=Skv - Sq)
        s = np.where(tri, s, -np.inf)
    m = s.max(-1, keepdims=True)
    m = np.where(np.isinf(m), 0.0, m)
    p = np.exp(s - m)
    denom = p.sum(-1, keepdims=True)
    denom = np.where(denom == 0, 1.0, denom)
    return np.einsum("bhqk,bhkd->bhqd", p / denom, vf)


@pytest.mark.parametrize("hq,hkv", [(4, 1), (8, 2)])
def test_flash_attention_gqa_interpret(hq, hkv):
    """GQA: kv heads indexed in the grid (never repeated)."""
    from whisper_tensor_tpu.backends.pallas.attention import flash_attention

    rng = np.random.default_rng(1)
    B, S, D = 1, 256, 64
    q = rng.standard_normal((B, hq, S, D)).astype(ml_dtypes.bfloat16)
    k = rng.standard_normal((B, hkv, S, D)).astype(ml_dtypes.bfloat16)
    v = rng.standard_normal((B, hkv, S, D)).astype(ml_dtypes.bfloat16)
    out = np.asarray(flash_attention(q, k, v, scale=D ** -0.5, causal=True,
                                     interpret=True)).astype(np.float32)
    ref = _ref_attention_gqa(q, k, v, D ** -0.5, True)
    assert np.abs(out - ref).max() < 2e-2


def test_flash_attention_additive_mask_interpret():
    """Additive (1,1,Sq,Skv) masks stream per q-tile (the LLM step-graph
    decode mask shape)."""
    from whisper_tensor_tpu.backends.pallas.attention import flash_attention

    rng = np.random.default_rng(2)
    B, H, Sq, Skv, D = 2, 2, 128, 256, 64
    q = rng.standard_normal((B, H, Sq, D)).astype(ml_dtypes.bfloat16)
    k = rng.standard_normal((B, H, Skv, D)).astype(ml_dtypes.bfloat16)
    v = rng.standard_normal((B, H, Skv, D)).astype(ml_dtypes.bfloat16)
    # causal-style additive mask with a ragged visible prefix
    vis = np.zeros((1, 1, Sq, Skv), np.float32)
    for i in range(Sq):
        vis[0, 0, i, min(Skv, i + 40):] = -1e30
    mask = vis.astype(ml_dtypes.bfloat16)
    out = np.asarray(flash_attention(q, k, v, scale=D ** -0.5, causal=False,
                                     mask=mask, interpret=True)
                     ).astype(np.float32)
    ref = _ref_attention_gqa(q, k, v, D ** -0.5, False, mask=mask)
    assert np.abs(out - ref).max() < 2e-2


def test_flash_attention_pos_bound_interpret():
    """pos_bound (B,) enforces the position-mask rule (key j visible to
    query row s iff j <= pos[b] + s) in-register — must equal the
    dense-mask reference, including per-batch ragged prefixes and GQA.
    This is the long-context prefill path: no (Sq, Skv) mask tensor is
    ever built (the dense form OOM'd scoped VMEM at S=8k)."""
    from whisper_tensor_tpu.backends.pallas.attention import flash_attention

    rng = np.random.default_rng(5)
    B, Hq, Hkv, Sq, Skv, D = 2, 4, 2, 256, 384, 64
    q = rng.standard_normal((B, Hq, Sq, D)).astype(ml_dtypes.bfloat16)
    k = rng.standard_normal((B, Hkv, Skv, D)).astype(ml_dtypes.bfloat16)
    v = rng.standard_normal((B, Hkv, Skv, D)).astype(ml_dtypes.bfloat16)
    pos = np.asarray([0, 100], np.int32)   # row 0: pure causal prefix
    out = np.asarray(flash_attention(q, k, v, scale=D ** -0.5,
                                     causal=False, pos_bound=pos,
                                     interpret=True)).astype(np.float32)
    # dense reference mask: j <= pos[b] + s
    j = np.arange(Skv)[None, None, None, :]
    s = np.arange(Sq)[None, None, :, None]
    vis = j <= (pos[:, None, None, None] + s)
    mask = np.where(vis, 0.0, -1e30).astype(np.float32)[:, :1]
    ref = _ref_attention_gqa(q, k, v, D ** -0.5, False, mask=mask)
    assert np.abs(out - ref).max() < 2e-2


def test_flash_attention_pos_bound_chunked_interpret():
    """The KV-chunked pos-bound path (Skv > WT_FLASH_KV_CHUNK splits
    into per-chunk kernel calls whose online-softmax stats merge
    exactly) == the single-call kernel == the dense reference."""
    import os

    from whisper_tensor_tpu.backends.pallas.attention import flash_attention

    rng = np.random.default_rng(6)
    B, Hq, Hkv, Sq, Skv, D = 2, 2, 1, 128, 512, 64
    q = rng.standard_normal((B, Hq, Sq, D)).astype(ml_dtypes.bfloat16)
    k = rng.standard_normal((B, Hkv, Skv, D)).astype(ml_dtypes.bfloat16)
    v = rng.standard_normal((B, Hkv, Skv, D)).astype(ml_dtypes.bfloat16)
    pos = np.asarray([40, 300], np.int32)   # row 1 crosses chunk 1
    single = np.asarray(flash_attention(
        q, k, v, scale=D ** -0.5, causal=False, pos_bound=pos,
        interpret=True)).astype(np.float32)
    old = os.environ.get("WT_FLASH_KV_CHUNK")
    os.environ["WT_FLASH_KV_CHUNK"] = "128"   # forces 4 chunks
    try:
        chunked = np.asarray(flash_attention(
            q, k, v, scale=D ** -0.5, causal=False, pos_bound=pos,
            interpret=True)).astype(np.float32)
    finally:
        if old is None:
            os.environ.pop("WT_FLASH_KV_CHUNK", None)
        else:
            os.environ["WT_FLASH_KV_CHUNK"] = old
    j = np.arange(Skv)[None, None, None, :]
    s = np.arange(Sq)[None, None, :, None]
    vis = j <= (pos[:, None, None, None] + s)
    mask = np.where(vis, 0.0, -1e30).astype(np.float32)[:, :1]
    ref = _ref_attention_gqa(q, k, v, D ** -0.5, False, mask=mask)
    assert np.abs(single - ref).max() < 2e-2
    assert np.abs(chunked - ref).max() < 2e-2
    assert np.abs(chunked - single).max() < 1e-2


def test_flash_attention_ragged_lengths_interpret():
    """Sq/Skv not multiples of the tile: padded in, key-masked in-kernel,
    query rows sliced out."""
    from whisper_tensor_tpu.backends.pallas.attention import flash_attention

    rng = np.random.default_rng(3)
    B, H, Sq, Skv, D = 1, 2, 200, 333, 64
    q = rng.standard_normal((B, H, Sq, D)).astype(ml_dtypes.bfloat16)
    k = rng.standard_normal((B, H, Skv, D)).astype(ml_dtypes.bfloat16)
    v = rng.standard_normal((B, H, Skv, D)).astype(ml_dtypes.bfloat16)
    out = np.asarray(flash_attention(q, k, v, scale=D ** -0.5, causal=True,
                                     interpret=True)).astype(np.float32)
    assert out.shape == (B, H, Sq, D)
    ref = _ref_attention_gqa(q, k, v, D ** -0.5, True)
    assert np.abs(out - ref).max() < 2e-2


def test_flash_gating_accepts_gqa_and_mask():
    import jax.numpy as jnp

    from whisper_tensor_tpu.backends.pallas.attention import \
        flash_attention_usable

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    # GQA below the empirical Skv threshold: XLA path keeps it
    q = jnp.zeros((1, 8, 256, 128), dtype=jnp.bfloat16)
    kv = jnp.zeros((1, 2, 256, 128), dtype=jnp.bfloat16)
    mask = jnp.zeros((1, 1, 256, 256), dtype=jnp.bfloat16)
    assert not flash_attention_usable(q, kv, kv, mask, 0.0)
    # GQA at long Skv: kernel path (on TPU)
    q2 = jnp.zeros((1, 8, 2048, 128), dtype=jnp.bfloat16)
    kv2 = jnp.zeros((1, 2, 2048, 128), dtype=jnp.bfloat16)
    assert flash_attention_usable(q2, kv2, kv2, None, 0.0) == on_tpu
    # plain MHA always eligible (on TPU)
    q3 = jnp.zeros((1, 2, 256, 64), dtype=jnp.bfloat16)
    assert flash_attention_usable(q3, q3, q3, None, 0.0) == on_tpu
    # per-head masks not streamable
    bad = jnp.zeros((1, 8, 2048, 2048), dtype=jnp.bfloat16)
    assert not flash_attention_usable(q2, kv2, kv2, bad, 0.0)
