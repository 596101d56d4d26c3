"""Ring attention vs full attention on the virtual 8-device mesh."""

import numpy as np
import pytest


def _full_attention(q, k, v, scale, causal):
    qf, kf, vf = (a.astype(np.float32) for a in (q, k, v))
    s = np.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if causal:
        S = q.shape[2]
        s = np.where(np.tril(np.ones((S, S), bool)), s, -np.inf)
    m = s.max(-1, keepdims=True)
    p = np.exp(s - m)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, vf)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("n_shards", [4, 8])
def test_ring_matches_full(causal, n_shards):
    import jax

    if len(jax.devices()) < n_shards:
        pytest.skip("not enough devices")
    from whisper_tensor_tpu.parallel.mesh import make_mesh
    from whisper_tensor_tpu.parallel.ring_attention import \
        ring_attention_sharded

    mesh = make_mesh(dp=1, sp=n_shards, tp=1)
    rng = np.random.default_rng(0)
    B, H, S, D = 2, 2, 64, 16
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    out = np.asarray(ring_attention_sharded(q, k, v, mesh, causal=causal))
    ref = _full_attention(q, k, v, D ** -0.5, causal)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ring_attention_jits_and_shards():
    """Composes under jit with sharded inputs (the training-path usage)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from whisper_tensor_tpu.parallel.mesh import make_mesh
    from whisper_tensor_tpu.parallel.ring_attention import \
        ring_attention_sharded

    mesh = make_mesh(dp=1, sp=4, tp=1)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 32, 8)).astype(np.float32)
    sh = NamedSharding(mesh, P(None, None, "sp", None))
    xd = jax.device_put(x, sh)

    @jax.jit
    def f(q):
        return ring_attention_sharded(q, q, q, mesh, causal=True).sum()

    val = float(f(xd))
    ref = _full_attention(x, x, x, 8 ** -0.5, True).sum()
    assert abs(val - ref) / abs(ref) < 1e-4
