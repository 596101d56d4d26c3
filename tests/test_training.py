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


def test_fsdp_shardings_rules():
    """fsdp_shardings: large weights gain a dp split on the largest
    free dim on top of tp rules; small weights keep their base spec."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from whisper_tensor_tpu.parallel.mesh import (GPT2_RULES, fsdp_shardings,
                                                  make_mesh)

    mesh = make_mesh(dp=4, sp=1, tp=2)
    names = ["wqkv_0", "wproj_0", "ln_0", "wpe"]
    shapes = [(256, 768), (256, 256), (256,), (32, 256)]
    shs = fsdp_shardings(names, shapes, mesh, rules=GPT2_RULES, min_size=4096)
    specs = [tuple(s.spec) for s in shs]
    assert specs[0] == ("dp", "tp")     # column-parallel + dp on dim 0
    assert specs[1] == ("tp", "dp")     # row-parallel + dp on the free dim
    assert "dp" not in specs[2] and "tp" not in specs[2]  # tiny norm: replicated
    assert specs[3] == (None, "dp")     # no tp rule: dp on largest dim
    # respects divisibility: a dim not divisible by dp stays unsharded
    sh = fsdp_shardings(["w"], [(254, 255)], mesh, min_size=1)[0]
    assert "dp" not in tuple(sh.spec)


def test_fsdp_train_matches_single_device():
    """ZeRO-3-style training (params + Adam state sharded over dp, on
    top of tp) must reproduce the single-device loss sequence, with
    parameters and optimizer state PHYSICALLY sharded (1/dp bytes per
    device)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from whisper_tensor_tpu.parallel.mesh import make_mesh

    cfg = GPT2Config(n_layer=1, n_head=4, n_embd=64, vocab_size=64,
                     n_positions=32)
    data = build_gpt2_train(random_gpt2_weights(cfg), cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (4, 17))

    def run(mesh, **kw):
        model = Model.new_from_onnx(data, name="fsdp-test")
        tr = LMTrainer(model, optimizer="adamw", lr=1e-2, mesh=mesh, **kw)
        params = tr.init_params()
        opt = tr.init_opt_state(params)
        out = []
        for _ in range(3):
            params, opt, loss = tr.train_step(params, opt,
                                              ids[:, :-1], ids[:, 1:])
            out.append(float(np.asarray(loss)))
        return out, params, opt

    single, _, _ = run(None)
    mesh = make_mesh(dp=4, sp=1, tp=2)
    fsdp, params, opt = run(mesh, fsdp=True, fsdp_min_size=4096)
    np.testing.assert_allclose(fsdp, single, rtol=2e-4, atol=1e-5)
    # params really are dp-sharded after the step (not re-replicated)
    p = params["wqkv_0"]                 # (64, 192): dp on dim0, tp on dim1
    assert "dp" in tuple(p.sharding.spec)
    shard = p.sharding.shard_shape(p.shape)
    assert shard[0] == p.shape[0] // 4 and shard[1] == p.shape[1] // 2
    # ... and so is the matching Adam moment (GSPMD propagation)
    mu = [l for l in jax.tree.leaves(opt) if getattr(l, "shape", None)
          == p.shape]
    assert mu and all("dp" in tuple(m.sharding.spec) for m in mu)


class TestTrainerOptions:
    def _setup(self, **kw):
        from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
            GPT2Config, build_gpt2_train, random_gpt2_weights)
        from whisper_tensor_tpu.model import Model
        from whisper_tensor_tpu.training.trainer import LMTrainer

        cfg = GPT2Config(n_layer=1, n_head=2, n_embd=32, vocab_size=64,
                         n_positions=32)
        m = Model.new_from_onnx(build_gpt2_train(random_gpt2_weights(cfg),
                                                 cfg))
        tr = LMTrainer(m, optimizer="adamw", lr=1e-2, **kw)
        p = tr.init_params()
        s = tr.init_opt_state(p)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 64, (4, 17))
        return tr, p, s, ids[:, :-1], ids[:, 1:]

    def test_grad_clip_trains(self):
        tr, p, s, x, y = self._setup(grad_clip=0.5)
        losses = []
        for _ in range(4):
            p, s, loss = tr.train_step(p, s, x, y)
            losses.append(float(np.asarray(loss)))
        assert losses[-1] < losses[0]

    def test_mixed_precision_bf16_compute(self):
        from whisper_tensor_tpu.dtype import DType

        tr, p, s, x, y = self._setup(compute_dtype=DType.BF16)
        # master weights stay f32
        assert all(np.asarray(v).dtype == np.float32 for v in p.values()
                   if np.asarray(v).dtype.kind == "f")
        losses = []
        for _ in range(6):
            p, s, loss = tr.train_step(p, s, x, y)
            losses.append(float(np.asarray(loss)))
        assert all(np.asarray(v).dtype == np.float32 for v in p.values()
                   if np.asarray(v).dtype.kind == "f")
        assert losses[-1] < losses[0]

    def test_gradient_accumulation_matches_big_batch(self):
        """2 accumulation microsteps over half-batches == one full-batch
        step (SGD: exact up to fp noise)."""
        tr_a, pa, sa, x, y = self._setup()   # geometry source
        from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
            GPT2Config, build_gpt2_train, random_gpt2_weights)
        from whisper_tensor_tpu.model import Model
        from whisper_tensor_tpu.training.trainer import LMTrainer

        cfg = GPT2Config(n_layer=1, n_head=2, n_embd=32, vocab_size=64,
                         n_positions=32)
        data = build_gpt2_train(random_gpt2_weights(cfg), cfg)

        big = LMTrainer(Model.new_from_onnx(data), optimizer="sgd", lr=1e-2)
        pb = big.init_params()
        sb = big.init_opt_state(pb)
        pb, sb, _ = big.train_step(pb, sb, x, y)

        acc = LMTrainer(Model.new_from_onnx(data), optimizer="sgd", lr=1e-2,
                        accum_steps=2)
        pc = acc.init_params()
        sc = acc.init_opt_state(pc)
        pc, sc, _ = acc.train_step(pc, sc, x[:2], y[:2])
        pc, sc, _ = acc.train_step(pc, sc, x[2:], y[2:])
        for k in pb:
            np.testing.assert_allclose(np.asarray(pb[k]), np.asarray(pc[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)


def test_remat_and_lr_schedule_match_baseline():
    """remat=True (jax.checkpoint forward) must produce the SAME loss
    trajectory as the plain trainer; warmup schedules must change the
    effective step size (warmup step << constant-lr step)."""
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_train, random_gpt2_weights)
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.training.trainer import LMTrainer

    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=97,
                     n_positions=16)
    wg = random_gpt2_weights(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (2, 8)).astype(np.int64)
    tgt = rng.integers(0, 97, (2, 8)).astype(np.int64)

    def run(**kw):
        m = Model.new_from_onnx(build_gpt2_train(wg, cfg))
        tr = LMTrainer(m, lr=1e-2, **kw)
        p, s = tr.init_params(), None
        s = tr.init_opt_state(p)
        losses = []
        for _ in range(3):
            p, s, loss = tr.train_step(p, s, ids, tgt)
            losses.append(float(loss))
        return np.asarray(losses), p

    base, p0 = run()
    remat, p1 = run(remat=True)
    np.testing.assert_allclose(remat, base, rtol=1e-5, atol=1e-6)
    for k in list(p0)[:3]:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p0[k]),
                                   rtol=1e-5, atol=1e-6)

    # selective policy (keep matmul outputs, recompute elementwise +
    # attention scores) — same math, different save set
    dots, p2 = run(remat="dots")
    np.testing.assert_allclose(dots, base, rtol=1e-5, atol=1e-6)
    for k in list(p0)[:3]:
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(p0[k]),
                                   rtol=1e-5, atol=1e-6)

    warm, _ = run(lr_schedule="warmup_cosine", warmup_steps=100,
                  total_steps=200)
    # with lr ~0 during warmup the first-step loss is unchanged but the
    # SECOND step's loss barely moves vs the constant-lr run
    assert abs(warm[0] - base[0]) < 1e-4
    assert abs(warm[1] - warm[0]) < abs(base[1] - base[0])

    lin, _ = run(lr_schedule="warmup_linear", warmup_steps=1,
                 total_steps=10)
    assert np.isfinite(lin).all()
