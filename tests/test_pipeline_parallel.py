"""Pipeline parallelism: GPipe schedule over the pp axis matches the
sequential application of all layers exactly."""

import numpy as np
import pytest


def _mlp_stage(p, h):
    import jax.numpy as jnp

    return jnp.tanh(h @ p["w"] + p["b"])


def _make(L, D, rng):
    return {"w": (rng.standard_normal((L, D, D)) / np.sqrt(D)).astype(np.float32),
            "b": (0.1 * rng.standard_normal((L, D))).astype(np.float32)}


def _sequential(params, x):
    h = x
    for i in range(params["w"].shape[0]):
        h = np.tanh(h @ params["w"][i] + params["b"][i])
    return h


@pytest.mark.parametrize("pp,M", [(2, 4), (4, 4), (4, 8)])
def test_pipeline_matches_sequential(pp, M):
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < pp:
        pytest.skip("not enough devices")
    from whisper_tensor_tpu.parallel.pipeline import pipeline_apply

    mesh = Mesh(np.asarray(jax.devices()[:pp]), ("pp",))
    rng = np.random.default_rng(0)
    L, D, B = pp * 2, 16, 16
    params = _make(L, D, rng)
    x = rng.standard_normal((B, D)).astype(np.float32)
    out = np.asarray(pipeline_apply(_mlp_stage, params, x, mesh,
                                    microbatches=M))
    ref = _sequential(params, x)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pipeline_composes_under_jit():
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from whisper_tensor_tpu.parallel.pipeline import pipeline_apply

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pp",))
    rng = np.random.default_rng(1)
    params = _make(4, 8, rng)
    x = rng.standard_normal((8, 8)).astype(np.float32)

    @jax.jit
    def f(params, x):
        return pipeline_apply(_mlp_stage, params, x, mesh,
                              microbatches=2).sum()

    val = float(f(params, x))
    ref = float(_sequential(params, x).sum())
    assert abs(val - ref) / abs(ref) < 1e-4


def test_pipeline_gradients():
    """The schedule is differentiable (training through the pipeline)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    from whisper_tensor_tpu.parallel.pipeline import pipeline_apply

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
    rng = np.random.default_rng(2)
    params = _make(2, 8, rng)
    x = rng.standard_normal((4, 8)).astype(np.float32)

    def loss_pp(params):
        return (pipeline_apply(_mlp_stage, params, x, mesh,
                               microbatches=2) ** 2).sum()

    def loss_seq(params):
        h = x
        for i in range(2):
            h = jnp.tanh(h @ params["w"][i] + params["b"][i])
        return (h ** 2).sum()

    g_pp = jax.grad(loss_pp)(params)
    g_seq = jax.grad(loss_seq)(params)
    np.testing.assert_allclose(np.asarray(g_pp["w"]), np.asarray(g_seq["w"]),
                               rtol=1e-4, atol=1e-5)
