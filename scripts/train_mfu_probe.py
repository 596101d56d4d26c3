"""Decompose the 124M train step to find where the non-MXU time goes.

VERDICT r3 item 10: 29.2% MFU at d=768 vs 45.1% at d=1536 says per-step
overhead (not matmul shape) dominates at small width. This probe times,
on the real chip, each nested slice of the step:

  fwd            jit(loss_fn) forward only (includes the CE loss)
  fwd_dummy      same forward but loss = logits.mean() (no CE)
  fwd_bwd        jit(value_and_grad(loss_fn)) — no optimizer
  full           trainer.train_step (fwd+bwd+AdamW, donated)

and reports the implied cost of (a) the cross-entropy loss, (b) the
backward, (c) the optimizer application.  Env knobs mirror bench_train:
WT_BENCH_BATCH/SEQ/WIDTH/LAYERS/HEADS/VOCAB.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from whisper_tensor_tpu.dtype import DType  # noqa: E402
from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (  # noqa: E402
    GPT2Config, build_gpt2_train, random_gpt2_weights)
from whisper_tensor_tpu.model import Model  # noqa: E402
from whisper_tensor_tpu.training.trainer import LMTrainer  # noqa: E402


def timed(fn, runs=8):
    fn()
    t0 = time.time()
    for _ in range(runs):
        r = fn()
    import jax

    jax.block_until_ready(r)
    return (time.time() - t0) / runs


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("WT_BENCH_BATCH", "8"))
    S = int(os.environ.get("WT_BENCH_SEQ", "1024"))
    cfg = GPT2Config(n_layer=int(os.environ.get("WT_BENCH_LAYERS", "12")),
                     n_head=int(os.environ.get("WT_BENCH_HEADS", "12")),
                     n_embd=int(os.environ.get("WT_BENCH_WIDTH", "768")),
                     vocab_size=int(os.environ.get("WT_BENCH_VOCAB",
                                                   "50257")),
                     n_positions=max(S, 1024))
    model = Model.new_from_onnx(build_gpt2_train(random_gpt2_weights(cfg),
                                                 cfg))
    trainer = LMTrainer(model, optimizer="adamw", lr=1e-4,
                        compute_dtype=DType.BF16)
    params = trainer.init_params()
    opt_state = trainer.init_opt_state(params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
    tgt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))

    fwd = jax.jit(trainer.loss_fn)

    def dummy_loss(p, i, t, frozen=None):
        logits = trainer._forward(p, i, frozen)
        return logits.astype(jnp.float32).mean()

    fwd_dummy = jax.jit(dummy_loss)
    fwd_bwd = jax.jit(jax.value_and_grad(trainer.loss_fn))

    t_fwd = timed(lambda: fwd(params, ids, tgt))
    t_fd = timed(lambda: fwd_dummy(params, ids, tgt))
    t_fb = timed(lambda: fwd_bwd(params, ids, tgt))

    # full step LAST (donation invalidates params/opt_state buffers)
    def full():
        nonlocal params, opt_state
        params, opt_state, loss = trainer.train_step(params, opt_state,
                                                     ids, tgt)
        return loss

    t_full = timed(full)

    tok = B * S
    n_param_mm = (cfg.n_layer * 12 * cfg.n_embd ** 2
                  + cfg.n_embd * cfg.vocab_size)
    flops_tok = 6 * n_param_mm + 3 * cfg.n_layer * 2 * S * cfg.n_embd
    peak = 197e12
    print(f"B={B} S={S} d={cfg.n_embd} L={cfg.n_layer} V={cfg.vocab_size}")
    print(f"fwd(dummy loss) : {t_fd * 1e3:8.2f} ms")
    print(f"fwd(CE loss)    : {t_fwd * 1e3:8.2f} ms   "
          f"(CE fwd cost ~{(t_fwd - t_fd) * 1e3:.2f} ms)")
    print(f"fwd+bwd         : {t_fb * 1e3:8.2f} ms   "
          f"(bwd cost ~{(t_fb - t_fwd) * 1e3:.2f} ms)")
    print(f"full step       : {t_full * 1e3:8.2f} ms   "
          f"(optimizer ~{(t_full - t_fb) * 1e3:.2f} ms)")
    print(f"tok/s {tok / t_full:,.0f}  MFU "
          f"{flops_tok * tok / t_full / peak * 100:.1f}%")
    # ideal splits: fwd 2N, bwd 4N of the 6N total
    print(f"ideal fwd {flops_tok * tok / 3 / peak * 1e3:.2f} ms, "
          f"ideal bwd {flops_tok * tok * 2 / 3 / peak * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
