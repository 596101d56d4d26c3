"""PipelinedLMTrainer: GPipe pp composed with dp and megatron tp in ONE
jitted train step (VERDICT r2 #8). Checks: the layered block math is
pinned against the imported-milli-graph LMTrainer, and the composed
dp2 x pp2 x tp2 step reproduces the single-device loss and parameters.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
    GPT2Config, build_gpt2_train, random_gpt2_weights)


def _cfg():
    return GPT2Config(n_layer=4, n_head=4, n_embd=32, vocab_size=64,
                      n_positions=32)


def _batch(rng, B=8, S=16, V=64):
    seq = rng.integers(1, V, (B, S + 1))
    return seq[:, :-1], seq[:, 1:]


def test_layered_matches_imported_graph():
    """layered_gpt2's hand block must equal the ONNX-imported training
    graph the LMTrainer normally drives (same weights, same loss)."""
    import jax
    from jax.sharding import Mesh

    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.parallel.pipeline_trainer import (
        PipelinedLMTrainer, layered_gpt2)
    from whisper_tensor_tpu.training.trainer import LMTrainer

    cfg = _cfg()
    wg = random_gpt2_weights(cfg)
    model = Model.new_from_onnx(build_gpt2_train(wg, cfg))
    ref = LMTrainer(model, optimizer="sgd", lr=0.0)
    rp = ref.init_params()
    rng = np.random.default_rng(0)
    ids, tgt = _batch(rng)
    ref_loss = float(ref.loss_fn(rp, ids, tgt))

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("dp", "pp", "tp"))
    tr = PipelinedLMTrainer(layered_gpt2(cfg, wg), mesh, microbatches=2)
    loss = float(tr.loss_fn(tr.init_params(), ids, tgt))
    assert abs(loss - ref_loss) / ref_loss < 1e-5, (loss, ref_loss)


def test_dp_pp_tp_composed_step_matches_single_device():
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from whisper_tensor_tpu.parallel.pipeline_trainer import (
        PipelinedLMTrainer, layered_gpt2)

    cfg = _cfg()
    wg = random_gpt2_weights(cfg)
    rng = np.random.default_rng(1)
    ids, tgt = _batch(rng)

    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                 ("dp", "pp", "tp"))
    ref = PipelinedLMTrainer(layered_gpt2(cfg, wg), mesh1,
                             microbatches=2, lr=1e-2)
    rp, ro = ref.init_params(), None
    ro = ref.init_opt_state(rp)

    mesh8 = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                 ("dp", "pp", "tp"))
    tr = PipelinedLMTrainer(layered_gpt2(cfg, wg, tp_axis="tp"), mesh8,
                            microbatches=2, lr=1e-2)
    p, o = tr.init_params(), None
    o = tr.init_opt_state(p)

    for _ in range(2):
        rp, ro, ref_loss = ref.train_step(rp, ro, ids, tgt)
        p, o, loss = tr.train_step(p, o, ids, tgt)
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=2e-4)
    # parameters after two composed-mesh steps match single-device
    np.testing.assert_allclose(
        np.asarray(p["head"]["wte_t"]), np.asarray(rp["head"]["wte_t"]),
        rtol=2e-3, atol=2e-5)
    blk = np.asarray(p["block"]["wproj"])
    np.testing.assert_allclose(blk, np.asarray(rp["block"]["wproj"]),
                               rtol=2e-3, atol=2e-5)
