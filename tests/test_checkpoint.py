"""Training checkpoint save/resume: bitwise-identical continuation, incl.
resuming a sharded run on a fresh trainer."""

import numpy as np
import pytest

from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (GPT2Config,
                                                           build_gpt2_train,
                                                           random_gpt2_weights)
from whisper_tensor_tpu.model import Model
from whisper_tensor_tpu.training.checkpoint import (load_checkpoint,
                                                    save_checkpoint)
from whisper_tensor_tpu.training.trainer import LMTrainer

CFG = GPT2Config(n_layer=1, n_head=2, n_embd=32, vocab_size=64, n_positions=32)


def _data(rng):
    ids = rng.integers(0, 64, (4, 17))
    return ids[:, :-1], ids[:, 1:]


def test_resume_is_bitwise_identical(tmp_path):
    data = build_gpt2_train(random_gpt2_weights(CFG), CFG)
    rng = np.random.default_rng(0)
    batches = [_data(rng) for _ in range(6)]

    # uninterrupted run
    tr = LMTrainer(Model.new_from_onnx(data), optimizer="adamw", lr=1e-2)
    p, s = tr.init_params(), None
    s = tr.init_opt_state(p)
    losses_a = []
    for x, y in batches:
        p, s, loss = tr.train_step(p, s, x, y)
        losses_a.append(float(np.asarray(loss)))
    final_a = {k: np.asarray(v) for k, v in p.items()}

    # interrupted at step 3, checkpointed, resumed on a FRESH trainer
    tr1 = LMTrainer(Model.new_from_onnx(data), optimizer="adamw", lr=1e-2)
    p1 = tr1.init_params()
    s1 = tr1.init_opt_state(p1)
    for x, y in batches[:3]:
        p1, s1, _ = tr1.train_step(p1, s1, x, y)
    ckpt = str(tmp_path / "ck.npz")
    save_checkpoint(ckpt, {k: np.asarray(v) for k, v in p1.items()}, s1,
                    step=3, extra={"lr": 1e-2})
    tr2 = LMTrainer(Model.new_from_onnx(data), optimizer="adamw", lr=1e-2)
    fresh = tr2.init_opt_state(tr2.init_params())
    p2, s2, step, extra = load_checkpoint(ckpt, opt_state_like=fresh)
    assert step == 3 and extra["lr"] == 1e-2
    losses_b = []
    p_run, s_run = p2, s2
    for x, y in batches[3:]:
        p_run, s_run, loss = tr2.train_step(p_run, s_run, x, y)
        losses_b.append(float(np.asarray(loss)))
    np.testing.assert_array_equal(losses_a[3:], losses_b)
    for k in final_a:
        np.testing.assert_array_equal(final_a[k], np.asarray(p_run[k]), err_msg=k)


def test_sharded_save_and_resharded_load(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from whisper_tensor_tpu.parallel.mesh import make_mesh

    cfg = GPT2Config(n_layer=1, n_head=4, n_embd=64, vocab_size=64,
                     n_positions=32)
    data = build_gpt2_train(random_gpt2_weights(cfg), cfg)
    mesh = make_mesh(dp=2, sp=2, tp=2)
    tr = LMTrainer(Model.new_from_onnx(data), optimizer="sgd", lr=1e-2,
                   mesh=mesh)
    p = tr.init_params()
    s = tr.init_opt_state(p)
    rng = np.random.default_rng(1)
    x, y = _data(rng)
    p, s, _ = tr.train_step(p, s, x, y)
    ckpt = str(tmp_path / "sharded.npz")
    save_checkpoint(ckpt, {k: np.asarray(v) for k, v in p.items()}, s, step=1)
    p2, s2, step, _ = load_checkpoint(
        ckpt, opt_state_like=s, mesh=mesh, param_shardings=tr.param_shardings,
        param_order=tr.weight_names)
    assert step == 1
    # resumed arrays carry the mesh sharding again
    any_sharded = any(getattr(v, "sharding", None) is not None
                      and not v.sharding.is_fully_replicated
                      for v in p2.values())
    assert any_sharded
    p3, s3, loss = tr.train_step(p2, s2, x, y)
    assert np.isfinite(float(np.asarray(loss)))
