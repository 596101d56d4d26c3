"""Training-path tests: jax.grad over traced milli graphs + sharded
multi-device train steps on the virtual CPU mesh.

The distributed tests are the framework's mesh-shape-parameterized
strategy (SURVEY.md §7 phase 8) — the reference has no distributed
anything to mirror (SURVEY.md §2.6), so these are net-new contracts.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (GPT2Config,
                                                           build_gpt2_train,
                                                           random_gpt2_weights)
from whisper_tensor_tpu.model import Model
from whisper_tensor_tpu.training.trainer import LMTrainer

CFG = GPT2Config(n_layer=1, n_head=2, n_embd=32, vocab_size=64, n_positions=32)


@pytest.fixture(scope="module")
def train_model():
    data = build_gpt2_train(random_gpt2_weights(CFG), CFG)
    return Model.new_from_onnx(data, name="train-tiny")


def test_loss_decreases_single_device(train_model):
    trainer = LMTrainer(train_model, optimizer="adamw", lr=1e-2)
    params = trainer.init_params()
    opt_state = trainer.init_opt_state(params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, (4, 17))
    losses = []
    for _ in range(8):
        params, opt_state, loss = trainer.train_step(
            params, opt_state, ids[:, :-1], ids[:, 1:])
        losses.append(float(np.asarray(loss)))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_grads_match_finite_difference(train_model):
    """jax.grad through the traced milli graph vs central differences on
    one scalar weight entry (ground-truth gradient check, mirroring the
    reference's per-op backward checks src/milli_graph/mod.rs:1875+)."""
    import jax

    trainer = LMTrainer(train_model, optimizer="sgd", lr=0.0)
    params = {k: np.asarray(v) for k, v in trainer.init_params().items()}
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, (2, 9))
    x, t = ids[:, :-1], ids[:, 1:]
    g = jax.grad(trainer.loss_fn)(params, x, t)
    name = "wqkv_0"
    eps = 1e-3
    idx = (3, 7)
    p_plus = {k: v.copy() for k, v in params.items()}
    p_plus[name][idx] += eps
    p_minus = {k: v.copy() for k, v in params.items()}
    p_minus[name][idx] -= eps
    fd = (float(trainer.loss_fn(p_plus, x, t)) -
          float(trainer.loss_fn(p_minus, x, t))) / (2 * eps)
    ad = float(np.asarray(g[name])[idx])
    assert abs(fd - ad) < 1e-3 * max(1.0, abs(fd)), (fd, ad)


def test_sharded_train_matches_single_device():
    """dp=2,sp=2,tp=2 mesh training must produce the same loss sequence
    as single-device (GSPMD is semantics-preserving)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from whisper_tensor_tpu.parallel.mesh import GPT2_RULES, make_mesh

    cfg = GPT2Config(n_layer=1, n_head=4, n_embd=64, vocab_size=64,
                     n_positions=32)
    data = build_gpt2_train(random_gpt2_weights(cfg), cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (4, 17))

    def run(mesh):
        model = Model.new_from_onnx(data, name="shard-test")
        tr = LMTrainer(model, optimizer="adamw", lr=1e-2, mesh=mesh)
        params = tr.init_params()
        opt = tr.init_opt_state(params)
        out = []
        for _ in range(3):
            params, opt, loss = tr.train_step(params, opt, ids[:, :-1], ids[:, 1:])
            out.append(float(np.asarray(loss)))
        return out

    single = run(None)
    mesh = make_mesh(dp=2, sp=2, tp=2)
    sharded = run(mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-5)
