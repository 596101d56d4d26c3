"""Symbolic training-artifact tests: milli autodiff, losses, optimizers.

Mirrors the reference's inline optimizer/backward/loss unit tests
(src/milli_graph/mod.rs:1683-2111, 3157-3487): closed-form optimizer
checks, gradient checks vs jax, end-to-end training convergence on the
oracle AND as one compiled XLA program.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.milli import MilliGraph
from whisper_tensor_tpu.milli.autodiff import generate_backward
from whisper_tensor_tpu.milli.losses import cross_entropy_loss, l1_loss, mse_loss
from whisper_tensor_tpu.milli.optimizers import (OptimizerKind,
                                                 OptimizerOptions,
                                                 generate_optimizer_ops)
from whisper_tensor_tpu.milli.ops import MatMul, SimpleBinary, SimpleUnary
from whisper_tensor_tpu.milli.training_graph import (build_training_graph,
                                                     init_opt_state)


def _forward_mlp():
    g = MilliGraph("mlp")
    x = g.add_input("x")
    w1, b1, w2 = g.add_input("w1"), g.add_input("b1"), g.add_input("w2")
    h = g.op1(SimpleUnary("tanh"),
              g.op1(SimpleBinary("add"), g.op1(MatMul(), x, w1), b1))
    g.mark_output("pred", g.op1(MatMul(), h, w2))
    return g


def _params(rng):
    return {"w1": rng.standard_normal((4, 8)).astype(np.float32) * 0.5,
            "b1": np.zeros(8, dtype=np.float32),
            "w2": rng.standard_normal((8, 3)).astype(np.float32) * 0.5}


def test_backward_matches_jax_grad():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    params = _params(rng)
    x = rng.standard_normal((5, 4)).astype(np.float32)
    t = rng.standard_normal((5, 3)).astype(np.float32)

    g, meta = build_training_graph(_forward_mlp(), list(params), "pred",
                                   loss="mse")
    feeds = {"x": x, "target": t, **params}
    out = g.eval(feeds)

    def jloss(p):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        pred = h @ p["w2"]
        return jnp.mean((pred - t) ** 2)

    jg = jax.grad(jloss)({k: jnp.asarray(v) for k, v in params.items()})
    for k in params:
        np.testing.assert_allclose(out[f"grad::{k}"], np.asarray(jg[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(out["loss"], float(jloss(params)), rtol=1e-5)


def test_cross_entropy_backward_matches_jax():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 7)).astype(np.float32)
    x = rng.standard_normal((6, 4)).astype(np.float32)
    t = rng.integers(0, 7, (6,)).astype(np.int64)

    fwd = MilliGraph("lin")
    xi, wi = fwd.add_input("x"), fwd.add_input("w")
    fwd.mark_output("pred", fwd.op1(MatMul(), xi, wi))
    g, meta = build_training_graph(fwd, ["w"], "pred", loss="cross_entropy")
    out = g.eval({"x": x, "w": w, "target": t})

    def jloss(wv):
        logits = x @ wv
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -lp[jnp.arange(6), t].mean()

    jg = jax.grad(jloss)(jnp.asarray(w))
    np.testing.assert_allclose(out["grad::w"], np.asarray(jg), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(out["loss"], float(jloss(w)), rtol=1e-5)


@pytest.mark.parametrize("kind,closed_form", [
    (OptimizerKind.SGD, lambda p, gr, st, lr: (p - lr * gr, st)),
    (OptimizerKind.SGD_MOMENTUM, None),
    (OptimizerKind.ADAM, None),
    (OptimizerKind.ADAMW, None),
])
def test_optimizers_match_reference_math(kind, closed_form):
    rng = np.random.default_rng(2)
    p = rng.standard_normal((3, 3)).astype(np.float32)
    gr = rng.standard_normal((3, 3)).astype(np.float32)
    lr, mom, b1, b2, eps, wd = 0.1, 0.9, 0.9, 0.999, 1e-8, 0.01

    g = MilliGraph("opt")
    p_in = g.add_input("p")
    gr_in = g.add_input("g")
    opts = OptimizerOptions(kind=kind, lr=lr, momentum=mom, beta1=b1,
                            beta2=b2, eps=eps,
                            weight_decay=wd if kind is OptimizerKind.ADAMW else 0.0)
    meta = generate_optimizer_ops(g, {"p": p_in}, {"p": gr_in}, opts)
    feeds = {"p": p, "g": gr}
    state = {}
    if kind is OptimizerKind.SGD_MOMENTUM:
        state["state::v::p"] = np.zeros_like(p)
    if kind in (OptimizerKind.ADAM, OptimizerKind.ADAMW):
        state["state::m::p"] = np.zeros_like(p)
        state["state::v::p"] = np.zeros_like(p)
        feeds["step"] = np.asarray(1.0, dtype=np.float32)
    out = g.eval({**feeds, **state})
    new_p = out["new::p"]

    # reference math
    if kind is OptimizerKind.SGD:
        expect = p - lr * gr
    elif kind is OptimizerKind.SGD_MOMENTUM:
        v = gr.copy()
        expect = p - lr * v
    else:
        m = (1 - b1) * gr
        v = (1 - b2) * gr * gr
        m_hat = m / (1 - b1)
        v_hat = v / (1 - b2)
        upd = m_hat / (np.sqrt(v_hat) + eps)
        if kind is OptimizerKind.ADAMW:
            upd = upd + wd * p
        expect = p - lr * upd
    np.testing.assert_allclose(new_p, expect, rtol=1e-5, atol=1e-6)


def test_training_graph_converges_oracle_and_xla():
    from whisper_tensor_tpu.backends.xla.compiler import compile_milli

    rng = np.random.default_rng(3)
    params = _params(rng)
    true = _params(np.random.default_rng(77))
    x = rng.standard_normal((32, 4)).astype(np.float32)
    t = (np.tanh(x @ true["w1"] + true["b1"]) @ true["w2"]).astype(np.float32)

    g, meta = build_training_graph(
        _forward_mlp(), list(params), "pred", loss="mse",
        optimizer=OptimizerOptions(OptimizerKind.ADAM, lr=0.05))
    state = init_opt_state(meta, params)

    def run(mode):
        p = {k: v.copy() for k, v in params.items()}
        s = {k: v.copy() for k, v in state.items()}
        losses = []
        compiled = None
        for step in range(30):
            feeds = {"x": x, "target": t, **p, **s,
                     "step": np.asarray(step + 1.0, dtype=np.float32)}
            if mode == "oracle":
                out = g.eval(feeds)
            else:
                if compiled is None:
                    compiled = compile_milli(g, feeds, use_cache=False)
                out = {k: np.asarray(v) for k, v in compiled(feeds).items()}
            losses.append(float(out["loss"]))
            p = {k: out[f"new::{k}"] for k in p}
            s = {k: out[meta.opt_state_in_to_out[k]] for k in s}
        return losses

    lo = run("oracle")
    lx = run("xla")
    assert lo[-1] < lo[0] * 0.2, lo
    np.testing.assert_allclose(lx, lo, rtol=1e-3, atol=1e-5)


def test_stop_gradients():
    from whisper_tensor_tpu.milli.autodiff import BackwardGenOptions

    rng = np.random.default_rng(4)
    fwd = MilliGraph("f")
    x = fwd.add_input("x")
    w = fwd.add_input("w")
    fwd.mark_output("pred", fwd.op1(MatMul(), x, w))
    g, _ = build_training_graph(
        fwd, ["w"], "pred", loss="mse",
        backward_options=BackwardGenOptions())
    # gradient flows to w but x was never requested: no error, works
    out = g.eval({"x": rng.standard_normal((2, 3)).astype(np.float32),
                  "w": rng.standard_normal((3, 2)).astype(np.float32),
                  "target": np.zeros((2, 2), dtype=np.float32)})
    assert "grad::w" in out
