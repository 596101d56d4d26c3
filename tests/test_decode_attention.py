"""Ragged flash-decode attention: Pallas kernel (interpret mode) and
the rank-1 position-mask extension of AttentionMilli vs the dense
oracle. On-chip dispatch is exercised by the serving benches; here the
kernel runs under the Pallas interpreter so CPU CI covers its math."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from whisper_tensor_tpu.backends.pallas.decode_attention import (  # noqa: E402
    _block_len, ragged_decode_attention)
from whisper_tensor_tpu.milli.ops.attention import AttentionMilli  # noqa: E402


def dense_ref(q, k, v, pos, scale):
    """f32 dense reference: row b sees keys j <= pos[b]."""
    B, Hq, _, D = q.shape
    Hkv, L = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    qf = np.asarray(q, np.float32)
    kf = np.repeat(np.asarray(k, np.float32), rep, axis=1)
    vf = np.repeat(np.asarray(v, np.float32), rep, axis=1)
    s = np.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    j = np.arange(L)[None, None, None, :]
    s = np.where(j <= pos[:, None, None, None], s, -np.inf)
    s -= s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, vf)


@pytest.mark.parametrize("B,Hq,Hkv,L,D", [
    (4, 8, 2, 192, 128),    # GQA rep=4, BL=64
    (2, 4, 4, 256, 128),    # MHA rep=1, BL=256
    (3, 16, 2, 512, 128),   # rep=8, BL=512 (single block)
])
def test_kernel_matches_dense(B, Hq, Hkv, L, D):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, Hq, 1, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, L, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, L, D)).astype(np.float32)
    pos = np.asarray([0, L - 1, L // 2, 7][:B], np.int32)
    scale = 1.0 / np.sqrt(D)
    qb, kb, vb = (jnp.asarray(x, jnp.bfloat16) for x in (q, k, v))
    out = ragged_decode_attention(qb, kb, vb, jnp.asarray(pos), scale,
                                  interpret=True)
    ref = dense_ref(np.asarray(qb, np.float32), np.asarray(kb, np.float32),
                    np.asarray(vb, np.float32), pos, scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=2e-2, rtol=2e-2)


def test_block_len():
    assert _block_len(2048) == 512
    assert _block_len(192) == 64
    assert _block_len(48) == 16
    assert _block_len(100) == 0  # not tileable -> kernel unusable


def test_rank1_mask_oracle_matches_dense_mask():
    """AttentionMilli with a rank-1 position mask == the dense additive
    mask the recipes used to build, on the numpy oracle, for decode
    (Sq=1) and chunked prefill (Sq=4)."""
    rng = np.random.default_rng(1)
    B, Hq, Hkv, L, D = 3, 4, 2, 32, 16
    for Sq in (1, 4):
        q = rng.standard_normal((B, Hq, Sq, D)).astype(np.float32)
        k = rng.standard_normal((B, Hkv, L, D)).astype(np.float32)
        v = rng.standard_normal((B, Hkv, L, D)).astype(np.float32)
        pos = np.asarray([0, 5, L - Sq], np.int64)
        op = AttentionMilli(scale=1.0 / np.sqrt(D))
        y_pos = op.eval([q, k, v, pos])[0]
        # dense additive mask: valid j <= pos[b] + s
        j = np.arange(L)[None, None, None, :]
        s = np.arange(Sq)[None, None, :, None]
        dense = np.where(j <= pos[:, None, None, None] + s,
                         np.float32(0), np.float32(-1e30))
        y_dense = op.eval([q, k, v, dense])[0]
        np.testing.assert_allclose(y_pos, y_dense, atol=1e-5)


def test_rank0_mask_matches_rank1_broadcast():
    """Rank-0 position mask (the scalar-pos prefill graphs) == the
    rank-1 form with the scalar broadcast to every row, on both the
    oracle and the CPU to_jax path. This is the mask form the llama
    recipe now emits instead of a dense (S, max_len) Where mask (the
    dense form OOM'd scoped VMEM in the long-context flash kernel)."""
    rng = np.random.default_rng(4)
    B, Hq, Hkv, L, D, Sq = 2, 4, 2, 32, 16, 8
    q = rng.standard_normal((B, Hq, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, L, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, L, D)).astype(np.float32)
    op = AttentionMilli(scale=1.0 / np.sqrt(D))
    for p in (0, 7, L - Sq):
        scalar = np.asarray(p, np.int64)            # rank-0
        vec = np.full((B,), p, np.int64)            # rank-1
        np.testing.assert_allclose(op.eval([q, k, v, scalar])[0],
                                   op.eval([q, k, v, vec])[0], atol=1e-6)
        got = jax.jit(lambda *a: op.to_jax(list(a))[0])(q, k, v, scalar)
        np.testing.assert_allclose(np.asarray(got),
                                   op.eval([q, k, v, vec])[0],
                                   atol=1e-4, rtol=1e-4)


def test_rank1_mask_to_jax_cpu_path():
    """On CPU the kernel gate is off: the rank-1 mask takes the dense
    synthesis path inside to_jax and must match the oracle."""
    rng = np.random.default_rng(2)
    B, Hq, Hkv, L, D = 2, 4, 2, 24, 8
    q = rng.standard_normal((B, Hq, 1, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, L, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, L, D)).astype(np.float32)
    pos = np.asarray([3, L - 1], np.int64)
    op = AttentionMilli(scale=1.0 / np.sqrt(D))
    want = op.eval([q, k, v, pos])[0]
    got = jax.jit(lambda *a: op.to_jax(list(a))[0])(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4,
                               rtol=1e-4)
