"""Expert-parallel MoE: dense numpy routing reference vs the GShard-style
dispatch-einsum layer, plus EP-sharded execution on the virtual mesh."""

import numpy as np
import pytest


def _ref_moe(x, rw, wg, wu, wd, k, norm=True, scale=1.0):
    """Per-token loop reference (float64): exact top-k SwiGLU MoE."""
    T, D = x.shape
    x64 = x.astype(np.float64)
    logits = x64 @ rw.astype(np.float64).T
    e = np.exp(logits - logits.max(-1, keepdims=True))
    gates = e / e.sum(-1, keepdims=True)
    out = np.zeros((T, D))
    for t in range(T):
        idx = np.argsort(-gates[t], kind="stable")[:k]
        w = gates[t, idx]
        if norm:
            w = w / w.sum()
        w = w * scale
        for wi, ei in zip(w, idx):
            g = x64[t] @ wg[ei].astype(np.float64)
            u = x64[t] @ wu[ei].astype(np.float64)
            h = g / (1 + np.exp(-g)) * u
            out[t] += wi * (h @ wd[ei].astype(np.float64))
    return out


def _params(rng, E, D, F):
    return {
        "router_w": rng.standard_normal((E, D)).astype(np.float32),
        "w_gate": (rng.standard_normal((E, D, F)) / np.sqrt(D)).astype(np.float32),
        "w_up": (rng.standard_normal((E, D, F)) / np.sqrt(D)).astype(np.float32),
        "w_down": (rng.standard_normal((E, F, D)) / np.sqrt(F)).astype(np.float32),
    }


@pytest.mark.parametrize("norm_topk,scale", [(True, 1.0), (False, 2.5)])
def test_moe_matches_dense_reference(norm_topk, scale):
    from whisper_tensor_tpu.parallel.moe import moe_ffn

    rng = np.random.default_rng(0)
    T, D, F, E, k = 16, 8, 12, 8, 2
    p = _params(rng, E, D, F)
    x = rng.standard_normal((T, D)).astype(np.float32)
    out = np.asarray(moe_ffn(x, p["router_w"], p["w_gate"], p["w_up"],
                             p["w_down"], k=k, capacity=T,  # no drops
                             norm_topk=norm_topk, scale=scale))
    ref = _ref_moe(x, p["router_w"], p["w_gate"], p["w_up"], p["w_down"],
                   k, norm=norm_topk, scale=scale)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_capacity_drop_is_graceful():
    """Tokens over capacity contribute zero for that expert — output stays
    finite and within the no-drop envelope."""
    from whisper_tensor_tpu.parallel.moe import moe_ffn

    rng = np.random.default_rng(1)
    T, D, F, E, k = 32, 8, 8, 4, 2
    p = _params(rng, E, D, F)
    x = rng.standard_normal((T, D)).astype(np.float32)
    full = np.asarray(moe_ffn(x, p["router_w"], p["w_gate"], p["w_up"],
                              p["w_down"], k=k, capacity=T))
    tight = np.asarray(moe_ffn(x, p["router_w"], p["w_gate"], p["w_up"],
                               p["w_down"], k=k, capacity=2))
    assert np.isfinite(tight).all()
    assert np.abs(tight).max() <= np.abs(full).max() * 1.5 + 1.0
    assert np.abs(tight - full).max() > 0  # something was actually dropped


def test_ep_sharded_matches_unsharded():
    """8 experts sharded over an ep=8 (and a tp×ep) mesh under jit: results
    identical to single-device, weights physically distributed."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from whisper_tensor_tpu.parallel.mesh import make_mesh
    from whisper_tensor_tpu.parallel.moe import moe_ffn, shard_moe_params

    rng = np.random.default_rng(2)
    T, D, F, E, k = 64, 16, 16, 8, 2
    p = _params(rng, E, D, F)
    x = rng.standard_normal((T, D)).astype(np.float32)
    base = np.asarray(moe_ffn(x, p["router_w"], p["w_gate"], p["w_up"],
                              p["w_down"], k=k, capacity=T))

    for mesh_kw in ({"ep": 8}, {"tp": 2, "ep": 4}):
        mesh = make_mesh(**mesh_kw)
        sp = shard_moe_params(p, mesh)
        assert not sp["w_gate"].sharding.is_fully_replicated
        # per-device shard really is 1/ep (×1/tp) of the stacked weights
        n_shards = np.prod([v for v in mesh_kw.values()])
        shard = sp["w_gate"].addressable_shards[0].data
        assert shard.size == sp["w_gate"].size // n_shards

        @jax.jit
        def f(x, rw, wg, wu, wd):
            return moe_ffn(x, rw, wg, wu, wd, k=k, capacity=T)

        out = np.asarray(f(x, sp["router_w"], sp["w_gate"], sp["w_up"],
                           sp["w_down"]))
        np.testing.assert_allclose(out, base, rtol=1e-5, atol=1e-6,
                                   err_msg=str(mesh_kw))


def test_capacity_helper():
    from whisper_tensor_tpu.parallel.moe import moe_capacity

    c = moe_capacity(1024, 64, 6, 1.25)
    assert c >= 1024 * 6 * 1.25 / 64
    assert c % 8 == 0


class TestLoadBalanceLoss:
    def test_uniform_router_is_optimal(self):
        import jax.numpy as jnp

        from whisper_tensor_tpu.parallel.moe import load_balance_loss

        T, E, k = 64, 8, 2
        uniform = jnp.zeros((T, E))
        assert float(load_balance_loss(uniform, k)) == pytest.approx(1.0,
                                                                     abs=1e-5)
        # a router collapsed onto one expert is heavily penalized
        collapsed = jnp.zeros((T, E)).at[:, 0].set(20.0)
        assert float(load_balance_loss(collapsed, k)) > 2.0

    def test_training_rebalances_experts(self):
        """Minimizing the aux loss spreads a collapsed router back out."""
        import jax
        import jax.numpy as jnp

        from whisper_tensor_tpu.parallel.moe import load_balance_loss

        rng = np.random.default_rng(0)
        T, D, E = 64, 8, 4
        x = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((E, D)) * 0.01
                         ).astype(np.float32)).at[0].add(3.0)  # collapsed

        def loss(w):
            return load_balance_loss(x @ w.T, k=1)

        l0 = float(loss(w))
        g = jax.grad(loss)
        for _ in range(50):
            w = w - 0.5 * g(w)
        l1 = float(loss(w))
        assert l1 < l0 and l1 < 1.5

    def test_moe_ffn_with_aux_trains_ep_sharded(self):
        """The training form runs jit+grad with EP-sharded experts."""
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from whisper_tensor_tpu.parallel.mesh import make_mesh
        from whisper_tensor_tpu.parallel.moe import (moe_ffn_with_aux,
                                                     shard_moe_params)

        rng = np.random.default_rng(1)
        E, D, F, T = 4, 8, 8, 32
        p = {"router_w": rng.standard_normal((E, D)).astype(np.float32),
             "w_gate": rng.standard_normal((E, D, F)).astype(np.float32) / 4,
             "w_up": rng.standard_normal((E, D, F)).astype(np.float32) / 4,
             "w_down": rng.standard_normal((E, F, D)).astype(np.float32) / 4}
        mesh = make_mesh(ep=4)
        sp = shard_moe_params(p, mesh)
        x = rng.standard_normal((T, D)).astype(np.float32)
        y = rng.standard_normal((T, D)).astype(np.float32)

        @jax.jit
        def loss(params, x, y):
            out, aux = moe_ffn_with_aux(
                x, params["router_w"], params["w_gate"], params["w_up"],
                params["w_down"], k=2, capacity=T)
            return ((out - y) ** 2).mean() + aux

        grads = jax.jit(jax.grad(loss))(sp, x, y)
        l0 = float(loss(sp, x, y))
        stepped = jax.tree.map(lambda p_, g_: p_ - 0.05 * g_, sp, grads)
        l1 = float(loss(stepped, x, y))
        assert np.isfinite(l1) and l1 < l0
