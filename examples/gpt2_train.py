"""Train a small GPT-2 on a synthetic copy task with the jax.grad path
(LMTrainer), optionally sharded over a (dp, sp, tp) mesh.

Reference equivalent: examples/gpt2_train.rs.

Run: python examples/gpt2_train.py [--steps 40] [--mesh dp=2,sp=2,tp=2]
(on CPU: JAX_PLATFORMS workaround is applied automatically)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--mesh", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute, f32 master weights")
    ap.add_argument("--grad-clip", type=float, default=None)
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient accumulation microsteps")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_train, random_gpt2_weights)
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.training.trainer import LMTrainer

    cfg = GPT2Config(n_layer=2, n_head=4, n_embd=64, vocab_size=128,
                     n_positions=64)
    model = Model.new_from_onnx(
        build_gpt2_train(random_gpt2_weights(cfg), cfg), name="gpt2-train")

    mesh = None
    if args.mesh:
        from whisper_tensor_tpu.parallel.mesh import make_mesh

        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        mesh = make_mesh(**{k: int(v) for k, v in spec.items()})
        print("mesh:", mesh)

    from whisper_tensor_tpu.dtype import DType

    trainer = LMTrainer(model, optimizer="adamw", lr=3e-3, mesh=mesh,
                        compute_dtype=DType.BF16 if args.bf16 else None,
                        grad_clip=args.grad_clip, accum_steps=args.accum)
    params = trainer.init_params()
    opt_state = trainer.init_opt_state(params)

    rng = np.random.default_rng(0)

    def copy_task_batch(B=8, S=32):
        """seq = [pattern, pattern]; the model must learn to copy."""
        half = S // 2
        pat = rng.integers(1, 128, (B, half))
        seq = np.concatenate([pat, pat], axis=1)
        return seq[:, :-1], seq[:, 1:]

    t0 = time.time()
    for step in range(args.steps):
        ids, targets = copy_task_batch()
        params, opt_state, loss = trainer.train_step(params, opt_state,
                                                     ids, targets)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step:3d}  loss {float(np.asarray(loss)):.4f}")
    print(f"done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
