"""Milli graph serde + training-as-SuperGraph (the serializable
training job; reference examples/mnist_train_supergraph.rs)."""

import json

import numpy as np
import pytest

from whisper_tensor_tpu.milli import MilliGraph
from whisper_tensor_tpu.milli.optimizers import (OptimizerKind,
                                                 OptimizerOptions)
from whisper_tensor_tpu.milli.ops import Constant, MatMul, SimpleUnary
from whisper_tensor_tpu.milli.serde import graph_from_json, graph_to_json
from whisper_tensor_tpu.milli.training_graph import build_training_graph

rng = np.random.default_rng(0)


def _mlp():
    g = MilliGraph("mlp")
    x = g.add_input("x")
    w1 = g.add_input("w1")
    w2 = g.add_input("w2")
    h = g.op1(SimpleUnary("tanh"), g.op1(MatMul(), x, w1))
    g.mark_output("pred", g.op1(MatMul(), h, w2))
    params = {"w1": rng.standard_normal((6, 8)).astype(np.float32),
              "w2": rng.standard_normal((8, 3)).astype(np.float32)}
    return g, params


def test_milli_serde_roundtrip_forward():
    g, params = _mlp()
    x = rng.standard_normal((4, 6)).astype(np.float32)
    ref = g.eval({"x": x, **params})["pred"]
    g2 = graph_from_json(json.loads(json.dumps(graph_to_json(g))))
    out = g2.eval({"x": x, **params})["pred"]
    np.testing.assert_array_equal(out, ref)


def test_milli_serde_roundtrip_training_graph():
    """The full training artifact (fwd+loss+backward+AdamW, with
    embedded Constants and enum fields) must survive JSON bit-exactly —
    including through the XLA path."""
    from whisper_tensor_tpu.backends.xla.compiler import compile_milli
    from whisper_tensor_tpu.milli.training_graph import init_opt_state

    g, params = _mlp()
    train, meta = build_training_graph(
        g, list(params), "pred", loss="mse",
        optimizer=OptimizerOptions(OptimizerKind.ADAMW, lr=1e-2))
    train2 = graph_from_json(json.loads(json.dumps(graph_to_json(train))))
    feeds = {"x": rng.standard_normal((4, 6)).astype(np.float32),
             "target": rng.standard_normal((4, 3)).astype(np.float32),
             "step": np.asarray(1.0, np.float32),
             **params, **init_opt_state(meta, params)}
    ref = train.eval(feeds)
    out = train2.eval(feeds)
    assert set(ref) == set(out)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]), err_msg=k)
    cref = compile_milli(train2, feeds)(feeds)
    np.testing.assert_allclose(np.asarray(cref["loss"]),
                               np.asarray(ref["loss"]), rtol=1e-5)


def test_training_supergraph_runs_and_learns():
    from whisper_tensor_tpu.super_graph import ExecutionContext, SuperGraph
    from whisper_tensor_tpu.super_graph.training import (
        build_training_supergraph, initial_train_state)

    g, params = _mlp()
    train, meta = build_training_graph(
        g, list(params), "pred", loss="mse",
        optimizer=OptimizerOptions(OptimizerKind.ADAMW, lr=5e-2))
    sg = build_training_supergraph(train, meta, ["x", "target"])
    sg2 = SuperGraph.from_json(json.loads(json.dumps(sg.to_json())))

    S = 10
    xs = rng.standard_normal((S, 4, 6)).astype(np.float32)
    w_true = rng.standard_normal((6, 3)).astype(np.float32)
    ys = np.tanh(xs @ np.ones((6, 8), np.float32) * 0.1) @ \
        rng.standard_normal((8, 3)).astype(np.float32)
    out = sg2.run(ExecutionContext(backend_mode="xla"),
                  {"init_state": initial_train_state(meta, params),
                   "batches_x": xs, "batches_target": ys.astype(np.float32)})
    losses = np.asarray(out["losses"], np.float64)
    assert losses.shape == (S,)
    assert losses[-1] < losses[0]
    # final state carries every param + opt slot + the step counter
    fs = out["final_state"]
    assert set(params) <= set(fs)
    assert float(fs["step"]) == S + 1


def test_training_supergraph_fresh_process(tmp_path):
    """The job must deserialize and RUN in a process where neither the
    builder nor the milli graph constructor ever executed."""
    import os
    import subprocess
    import sys

    from whisper_tensor_tpu.super_graph.training import (
        build_training_supergraph, initial_train_state)

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    g, params = _mlp()
    train, meta = build_training_graph(
        g, list(params), "pred", loss="mse",
        optimizer=OptimizerOptions(OptimizerKind.SGD, lr=1e-2))
    sg = build_training_supergraph(train, meta, ["x", "target"])
    (tmp_path / "job.json").write_text(json.dumps(sg.to_json()))
    np.savez(tmp_path / "feeds.npz",
             x=rng.standard_normal((3, 4, 6)).astype(np.float32),
             y=rng.standard_normal((3, 4, 3)).astype(np.float32),
             **{f"s_{k}": v for k, v in
                initial_train_state(meta, params, has_step=False).items()})
    code = f"""
import sys, json
import numpy as np
sys.path.insert(0, {ROOT!r})
import jax; jax.config.update('jax_platforms', 'cpu')
from whisper_tensor_tpu.super_graph import ExecutionContext, SuperGraph
import whisper_tensor_tpu.super_graph.training  # registers the node kind
sg = SuperGraph.from_json(json.load(open({str(tmp_path / 'job.json')!r})))
z = np.load({str(tmp_path / 'feeds.npz')!r})
state = {{k[2:]: z[k] for k in z.files if k.startswith('s_')}}
out = sg.run(ExecutionContext(backend_mode='oracle'),
             {{'init_state': state, 'batches_x': z['x'],
               'batches_target': z['y']}})
assert np.asarray(out['losses']).shape == (3,)
print('OK')
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_supergraph_example_smoke():
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "examples/mnist_train_supergraph.py",
                        "--smoke"], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr
    assert "accuracy" in r.stdout


def test_serde_registry_covers_all_op_kinds():
    """Every milli op class in the package must be serializable (the
    reference's milli layer serializes completely)."""
    import importlib
    import inspect
    import pkgutil

    import whisper_tensor_tpu.milli.ops as ops_pkg
    from whisper_tensor_tpu.milli.ir import MilliOp
    from whisper_tensor_tpu.milli.serde import op_registry

    reg = op_registry()
    missing = []
    for info in pkgutil.iter_modules(ops_pkg.__path__):
        mod = importlib.import_module(f"whisper_tensor_tpu.milli.ops.{info.name}")
        for name in dir(mod):
            c = getattr(mod, name)
            if (inspect.isclass(c) and issubclass(c, MilliOp)
                    and c is not MilliOp
                    and getattr(c, "KIND", "?") != "?"
                    and c.KIND not in reg):
                missing.append((info.name, c.KIND))
    assert not missing, missing
