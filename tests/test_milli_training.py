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


def test_transformer_training_graph_matches_torch():
    """The editable milli training artifact now differentiates a REAL
    transformer (attention + LayerNorm + gelu + tied embeddings):
    grads from the generated backward graph match torch autograd.
    (Round-1 weak #7: these backwards used to raise.)"""
    import torch
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_train, hf_gpt2_weight_getter)
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.milli.training_graph import build_training_graph

    torch.manual_seed(0)
    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=16, vocab_size=61,
                     n_positions=32)
    hf = GPT2LMHeadModel(HFConfig(n_layer=2, n_head=2, n_embd=16,
                                  vocab_size=61, n_positions=32,
                                  attn_pdrop=0.0, embd_pdrop=0.0,
                                  resid_pdrop=0.0))
    hf.eval()
    data = build_gpt2_train(hf_gpt2_weight_getter(hf), cfg)
    model = Model.new_from_onnx(data)
    # training mode: small weights (LN scales, biases) stay runtime
    # inputs so they receive gradients
    milli, weight_inputs = model.graph.to_milli(bake_small_constants=False)
    params = sorted(weight_inputs)
    B, S = 2, 8
    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.tensor_info import TensorInfo

    g, meta = build_training_graph(
        milli, params, "logits", loss="cross_entropy",
        input_infos={"input_ids": TensorInfo.shaped(DT.I64, [B, S])})

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 61, (B, S)).astype(np.int64)
    tgt = rng.integers(0, 61, (B, S)).astype(np.int64)
    feeds = {"input_ids": ids, "target": tgt}
    for n in params:
        feeds[n] = model.graph.store.get_numeric(n).numpy()
    out = g.eval(feeds)

    # torch referee
    xt = torch.from_numpy(ids)
    res = hf(input_ids=xt)
    loss = torch.nn.functional.cross_entropy(
        res.logits.reshape(-1, 61), torch.from_numpy(tgt).reshape(-1))
    hf.zero_grad()
    loss.backward()
    np.testing.assert_allclose(out["loss"], float(loss), rtol=1e-4,
                               atol=1e-5)
    sd_grads = {k: v.grad for k, v in hf.named_parameters()}
    checks = {
        "wqkv_0": "transformer.h.0.attn.c_attn.weight",
        "wproj_1": "transformer.h.1.attn.c_proj.weight",
        "ln1g_0": "transformer.h.0.ln_1.weight",
        "lnfg": "transformer.ln_f.weight",
        "wfc_1": "transformer.h.1.mlp.c_fc.weight",
        "wpe": "transformer.wpe.weight",
    }
    for ours, theirs in checks.items():
        ref = sd_grads[theirs].numpy()
        got = np.asarray(out[f"grad::{ours}"])
        if ours == "wpe":
            ref = ref[:got.shape[0]]
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4,
                                   err_msg=ours)
    # tied embedding: wte grad (embedding side) + wte_t grad (lm head,
    # transposed) together form torch's tied wte.weight grad
    wte_g = np.asarray(out["grad::wte"]) + np.asarray(out["grad::wte_t"]).T
    np.testing.assert_allclose(wte_g, sd_grads["transformer.wte.weight"].numpy(),
                               rtol=2e-3, atol=2e-4)

    # the same training graph compiles to ONE XLA program
    from whisper_tensor_tpu.backends.xla.compiler import compile_milli

    comp = compile_milli(g, feeds, use_cache=False)
    cout = comp(feeds)
    np.testing.assert_allclose(np.asarray(cout["loss"]), out["loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cout["grad::wqkv_0"]),
                               out["grad::wqkv_0"], rtol=1e-4, atol=1e-5)


def test_attention_softcap_backward_matches_jax():
    """Softcapped attention (ONNX-23 stage order: bias/causal added to
    the scores BEFORE the cap — the qk_matmul_output_mode enum order)
    differentiates in the milli training artifact — grads for q/k/v
    match jax.grad of the same formula (incl. GQA group-summing of
    k/v grads; masked entries sit at tanh saturation so their cap
    derivative is exactly 0)."""
    import jax
    import jax.numpy as jnp

    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.milli.ops.attention import AttentionMilli
    from whisper_tensor_tpu.tensor_info import TensorInfo

    rng = np.random.default_rng(3)
    B, Hq, Hkv, S, D = 2, 4, 2, 6, 8
    cap = 5.0
    qv = rng.standard_normal((B, Hq, S, D)).astype(np.float32)
    kv = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    vv = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    tv = rng.standard_normal((B, Hq, S, D)).astype(np.float32)

    g = MilliGraph("attn_softcap")
    q, k, v = g.add_input("q"), g.add_input("k"), g.add_input("v")
    g.mark_output("pred", g.op1(
        AttentionMilli(is_causal=True, softcap=cap), q, k, v))
    tg, meta = build_training_graph(
        g, ["q", "k", "v"], "pred", loss="mse",
        input_infos={"q": TensorInfo.shaped(DT.F32, [B, Hq, S, D]),
                     "k": TensorInfo.shaped(DT.F32, [B, Hkv, S, D]),
                     "v": TensorInfo.shaped(DT.F32, [B, Hkv, S, D])})
    out = tg.eval({"q": qv, "k": kv, "v": vv, "target": tv})

    def jloss(p):
        kf = jnp.repeat(p["k"], Hq // Hkv, axis=1)
        vf = jnp.repeat(p["v"], Hq // Hkv, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", p["q"], kf) / np.sqrt(D)
        causal = jnp.tril(jnp.ones((S, S), bool))
        s = jnp.where(causal, s, -1e30)
        s = cap * jnp.tanh(s / cap)
        pred = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), vf)
        return jnp.mean((pred - tv) ** 2)

    jg = jax.grad(jloss)({"q": jnp.asarray(qv), "k": jnp.asarray(kv),
                          "v": jnp.asarray(vv)})
    for n in ("q", "k", "v"):
        np.testing.assert_allclose(out[f"grad::{n}"], np.asarray(jg[n]),
                                   rtol=1e-3, atol=1e-5, err_msg=n)


@pytest.mark.parametrize("starts,ends,axes,steps", [
    ([1], [7], [0], [2]),          # strided
    ([6], [-9], [0], [-2]),        # negative step
    ([0, 5], [8, 0], [0, 1], [3, -1]),  # multi-axis mixed
    ([2], [6], [1], [1]),          # unit step (regression)
])
def test_slice_backward_strided_matches_jax(starts, ends, axes, steps):
    """Strided / negative-step Slice now differentiates: the grad is
    scattered back through zero-interleaving (was NotImplementedError)."""
    import jax
    import jax.numpy as jnp

    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.milli.ops import Constant
    from whisper_tensor_tpu.milli.ops.shape import Slice
    from whisper_tensor_tpu.tensor_info import TensorInfo

    rng = np.random.default_rng(11)
    xv = rng.standard_normal((8, 6)).astype(np.float32)

    g = MilliGraph("slice_bwd")
    x = g.add_input("x")
    s = g.op1(Constant(np.asarray(starts, np.int64)))
    e = g.op1(Constant(np.asarray(ends, np.int64)))
    a = g.op1(Constant(np.asarray(axes, np.int64)))
    st = g.op1(Constant(np.asarray(steps, np.int64)))
    g.mark_output("pred", g.op1(Slice(), x, s, e, a, st))
    sliced = Slice().eval([xv, np.asarray(starts), np.asarray(ends),
                           np.asarray(axes), np.asarray(steps)])[0]
    tv = rng.standard_normal(sliced.shape).astype(np.float32)
    tg, meta = build_training_graph(
        g, ["x"], "pred", loss="mse",
        input_infos={"x": TensorInfo.shaped(DT.F32, [8, 6])})
    out = tg.eval({"x": xv, "target": tv})

    def jloss(x):
        idx = Slice()._indexer((8, 6), np.asarray(starts), np.asarray(ends),
                               np.asarray(axes), np.asarray(steps))
        return jnp.mean((x[idx] - tv) ** 2)

    jg = jax.grad(jloss)(jnp.asarray(xv))
    np.testing.assert_allclose(out["grad::x"], np.asarray(jg),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out["loss"],
                               float(jloss(jnp.asarray(xv))), rtol=1e-5)


@pytest.mark.parametrize("mode,domain", [
    ("tan", (-0.6, 0.6)), ("asin", (-0.8, 0.8)), ("acos", (-0.8, 0.8)),
    ("atan", (-2.0, 2.0)), ("sinh", (-1.5, 1.5)), ("cosh", (-1.5, 1.5)),
    ("asinh", (-2.0, 2.0)), ("acosh", (1.2, 3.0)), ("atanh", (-0.7, 0.7)),
    ("floor", (0.1, 0.9)), ("ceil", (0.1, 0.9)),
    ("round", (0.1, 0.4)), ("sign", (0.5, 2.0)),
])
def test_unary_backward_family_matches_jax(mode, domain):
    """Trig/hyperbolic/rounding unary backwards (were
    NotImplementedError) gradient-checked vs jax."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    xv = rng.uniform(*domain, (3, 4)).astype(np.float32)
    tv = rng.standard_normal((3, 4)).astype(np.float32)

    g = MilliGraph(f"u_{mode}")
    x = g.add_input("x")
    g.mark_output("pred", g.op1(SimpleUnary(mode), x))
    tg, _ = build_training_graph(g, ["x"], "pred", loss="mse")
    out = tg.eval({"x": xv, "target": tv})

    jfn = {"tan": jnp.tan, "asin": jnp.arcsin, "acos": jnp.arccos,
           "atan": jnp.arctan, "sinh": jnp.sinh, "cosh": jnp.cosh,
           "asinh": jnp.arcsinh, "acosh": jnp.arccosh,
           "atanh": jnp.arctanh,
           "softsign": lambda v: v / (1 + jnp.abs(v)),
           "floor": jnp.floor, "ceil": jnp.ceil, "round": jnp.round,
           "sign": jnp.sign}[mode]
    jg = jax.grad(lambda v: jnp.mean((jfn(v) - tv) ** 2))(jnp.asarray(xv))
    np.testing.assert_allclose(out[f"grad::x"], np.asarray(jg),
                               rtol=1e-4, atol=1e-5, err_msg=mode)


@pytest.mark.parametrize("mode,keepdims", [
    ("prod", True), ("prod", False), ("l1", False), ("l2", True),
    ("l2", False), ("sumsquare", False), ("logsumexp", True),
    ("logsumexp", False),
])
def test_reduce_backward_family_matches_jax(mode, keepdims):
    """prod/l1/l2/sumsquare/logsumexp Reduce backwards (were
    NotImplementedError) gradient-checked vs jax."""
    import jax
    import jax.numpy as jnp

    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.milli.ops.reduce import Reduce
    from whisper_tensor_tpu.tensor_info import TensorInfo

    rng = np.random.default_rng(9)
    xv = (rng.uniform(0.3, 2.0, (3, 4, 5)) *
          np.where(rng.random((3, 4, 5)) < 0.5, -1, 1)).astype(np.float32)

    g = MilliGraph(f"red_{mode}")
    x = g.add_input("x")
    g.mark_output("pred", g.op1(Reduce(mode, axes=[1], keepdims=keepdims), x))
    tshape = (3, 1, 5) if keepdims else (3, 5)
    tv = rng.standard_normal(tshape).astype(np.float32)
    tg, _ = build_training_graph(
        g, ["x"], "pred", loss="mse",
        input_infos={"x": TensorInfo.shaped(DT.F32, [3, 4, 5])})
    out = tg.eval({"x": xv, "target": tv})

    jfn = {"prod": lambda v: jnp.prod(v, axis=1, keepdims=keepdims),
           "l1": lambda v: jnp.sum(jnp.abs(v), axis=1, keepdims=keepdims),
           "l2": lambda v: jnp.sqrt(jnp.sum(v * v, axis=1,
                                            keepdims=keepdims)),
           "sumsquare": lambda v: jnp.sum(v * v, axis=1, keepdims=keepdims),
           "logsumexp": lambda v: jax.scipy.special.logsumexp(
               v, axis=1, keepdims=keepdims)}[mode]
    jg = jax.grad(lambda v: jnp.mean((jfn(v) - tv) ** 2))(jnp.asarray(xv))
    np.testing.assert_allclose(out["grad::x"], np.asarray(jg),
                               rtol=1e-4, atol=1e-5, err_msg=mode)


def test_external_gradients_bptt_seeding():
    """BackwardGenOptions.external_gradients (reference BPTT seeding,
    mod.rs:207-243 + examples/rwkv_lora_train.rs): a state output's
    incoming future-step gradient enters as a graph INPUT and
    accumulates with the local loss path. Closed-form referee:
    L_total = mean(h @ W2) + <g_h, h>  with h = x @ W
    => dW = x.T @ (G_y @ W2.T + g_h)."""
    from whisper_tensor_tpu.milli.autodiff import BackwardGenOptions
    from whisper_tensor_tpu.milli.ops import Reduce

    rng = np.random.default_rng(11)
    g = MilliGraph("bptt")
    x_t = g.add_input("x")
    w_t = g.add_input("W")
    w2_t = g.add_input("W2")
    h_t = g.op1(MatMul(), x_t, w_t)
    g.mark_output("h", h_t)
    y_t = g.op1(MatMul(), h_t, w2_t)
    loss_t = g.op1(Reduce("mean", axes=None, keepdims=False), y_t)
    g.mark_output("loss", loss_t)

    grads = generate_backward(
        g, loss_t, {"W": w_t},
        BackwardGenOptions(external_gradients={h_t: "g_h"}))
    g.mark_output("grad::W", grads["W"])

    x = rng.standard_normal((3, 4)).astype(np.float32)
    W = rng.standard_normal((4, 5)).astype(np.float32)
    W2 = rng.standard_normal((5, 2)).astype(np.float32)
    g_h = rng.standard_normal((3, 5)).astype(np.float32)
    out = g.eval({"x": x, "W": W, "W2": W2, "g_h": g_h})

    G_y = np.full((3, 2), 1.0 / 6.0, np.float32)   # d(mean)/dy
    want = x.T @ (G_y @ W2.T + g_h)
    np.testing.assert_allclose(out["grad::W"], want, rtol=1e-5,
                               atol=1e-6)
    # and the forward state output is untouched by the seeding
    np.testing.assert_allclose(out["h"], x @ W, rtol=1e-6, atol=1e-6)


def test_bf16_lora_training_artifact():
    """The failure the reference DOCUMENTS as open (examples/
    rwkv_lora_train.rs:11-27: 'mixed BF16/F32 dtype mismatches break
    the backward pass') must not exist here by construction: a bf16
    forward with bf16 adapters trains through the symbolic artifact —
    the validating oracle checks every assignment's dtype — and the
    adapter grads match jax.grad over the same bf16 graph."""
    import jax
    import jax.numpy as jnp

    from whisper_tensor_tpu.backends.xla.compiler import _trace_graph
    from whisper_tensor_tpu.dtype import DType as DT
    from whisper_tensor_tpu.milli.transforms import inject_lora
    from whisper_tensor_tpu.tensor_info import TensorInfo

    rng = np.random.default_rng(12)
    bf16 = DT.BF16.to_numpy()
    W = (0.25 * rng.standard_normal((8, 6))).astype(bf16)
    g = MilliGraph("lin16")
    x_t = g.add_input("x")
    w_t = g.add_input("W")
    g.mark_output("y", g.op1(MatMul(), x_t, w_t))
    ad = inject_lora(g, ["W"], rank=2,
                     weight_getter=lambda n: W, seed=5)
    ad["W::lora_b"] = (0.1 * rng.standard_normal((2, 6))).astype(bf16)
    assert all(v.dtype == bf16 for v in ad.values())
    x = (0.5 * rng.standard_normal((4, 8))).astype(bf16)
    tgt = rng.standard_normal((4, 6)).astype(bf16)

    names = sorted(ad)
    train, meta = build_training_graph(
        g, names, "y", loss="mse",
        input_infos={"x": TensorInfo.numeric(x),
                     "W": TensorInfo.numeric(W),
                     **{n: TensorInfo.numeric(v) for n, v in ad.items()}})
    feeds = {"x": x, "W": W, "target": tgt, **ad}
    out = train.eval(feeds, validate=True)    # dtype-checked eval
    assert set(meta.param_to_grad) == set(names)

    fn = _trace_graph(g, {})
    order = list(g.inputs)

    def loss(a, b):
        by = {"x": jnp.asarray(x), "W": jnp.asarray(W),
              "W::lora_a": a, "W::lora_b": b}
        yv = dict(zip(g.outputs, fn(*[by[n] for n in order])))["y"]
        return jnp.mean((yv.astype(jnp.float32)
                         - jnp.asarray(tgt).astype(jnp.float32)) ** 2)

    ga, gb = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(ad["W::lora_a"]), jnp.asarray(ad["W::lora_b"]))
    np.testing.assert_allclose(
        np.asarray(out["grad::W::lora_a"], np.float32),
        np.asarray(ga, np.float32), rtol=0.1, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(out["grad::W::lora_b"], np.float32),
        np.asarray(gb, np.float32), rtol=0.1, atol=0.02)


def test_groupnorm_backward_matches_jax():
    """GroupNorm backward (per-group LN math + channel-param sums)
    vs jax.grad, all three inputs."""
    import jax
    import jax.numpy as jnp

    from whisper_tensor_tpu.milli.autodiff import BackwardGenOptions
    from whisper_tensor_tpu.milli.ops import Reduce
    from whisper_tensor_tpu.milli.ops.norm import GroupNormMilli
    from whisper_tensor_tpu.tensor_info import TensorInfo

    rng = np.random.default_rng(13)
    N, C, S, G = 2, 6, 5, 3
    x = rng.standard_normal((N, C, S)).astype(np.float32)
    sc = rng.standard_normal(C).astype(np.float32)
    bi = rng.standard_normal(C).astype(np.float32)

    g = MilliGraph("gn")
    x_t, s_t, b_t = (g.add_input(n) for n in ("x", "s", "b"))
    y_t = g.op1(GroupNormMilli(epsilon=1e-5, num_groups=G), x_t, s_t, b_t)
    # scalar loss: mean(y * w) with a fixed random weighting so the
    # gradient isn't uniform
    wv = rng.standard_normal((N, C, S)).astype(np.float32)
    w_t = g.add_input("w")
    loss_t = g.op1(Reduce("mean", None, keepdims=False),
                   g.op1(SimpleBinary("mul"), y_t, w_t))
    g.mark_output("loss", loss_t)
    g.infer_all({n: TensorInfo.numeric(v) for n, v in
                 (("x", x), ("s", sc), ("b", bi), ("w", wv))})
    grads = generate_backward(g, loss_t,
                              {"x": x_t, "s": s_t, "b": b_t})
    for n, t in grads.items():
        g.mark_output(f"grad::{n}", t)
    out = g.eval({"x": x, "s": sc, "b": bi, "w": wv}, validate=True)

    def jloss(xv, sv, bv):
        xg = xv.reshape(N, G, C // G, S)
        m = xg.mean(axis=(2, 3), keepdims=True)
        v = ((xg - m) ** 2).mean(axis=(2, 3), keepdims=True)
        y = ((xg - m) / jnp.sqrt(v + 1e-5)).reshape(N, C, S)
        y = y * sv[None, :, None] + bv[None, :, None]
        return jnp.mean(y * wv)

    jx, js, jb = jax.grad(jloss, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(sc), jnp.asarray(bi))
    np.testing.assert_allclose(out["grad::x"], np.asarray(jx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["grad::s"], np.asarray(js),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["grad::b"], np.asarray(jb),
                               rtol=1e-4, atol=1e-5)
