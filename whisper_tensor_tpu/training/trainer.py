"""LM training driver: jax.grad over a traced milli graph + optax.

Reference equivalent: the symbolic-autodiff training generation
(src/milli_graph/mod.rs:1170-1432). TPU redesign per SURVEY.md §7
phase 7: the *math* uses jax.grad over the same milli graph the
inference path executes (every milli to_jax rule is differentiable),
while the milli-level symbolic autodiff/optimizers remain available as
the editable-artifact path (milli.autodiff). Parallelism: params are
placed with NamedShardings (parallel.mesh rules); GSPMD inserts the
DP/TP/SP collectives.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..dtype import DType
from ..model import Model


class LMTrainer:
    """Next-token cross-entropy trainer over a training-mode graph
    (inputs: input_ids; outputs: logits)."""

    def __init__(self, model: Model, optimizer: str = "adamw",
                 lr: float = 3e-4, weight_decay: float = 0.01,
                 mesh=None, rules=None, param_dtype: DType = DType.F32,
                 grad_clip: Optional[float] = None,
                 compute_dtype: Optional[DType] = None,
                 accum_steps: int = 1,
                 lr_schedule: Optional[str] = None,
                 warmup_steps: int = 0, total_steps: int = 0,
                 remat: "bool | str" = False, fsdp: bool = False,
                 fsdp_min_size: int = 2 ** 16,
                 lora_rank: int = 0, lora_alpha: Optional[float] = None,
                 lora_targets: Optional[Sequence[str]] = None,
                 quantize_base: Optional[str] = None):
        """grad_clip: global-norm clipping before the optimizer.
        compute_dtype: mixed precision — params stay in param_dtype
        (f32 master weights) and are cast per-step for the forward/
        backward; grads come back in compute dtype and update the f32
        masters (the standard TPU bf16-compute recipe).
        accum_steps: gradient accumulation via optax.MultiSteps.
        lr_schedule: None (constant) | "warmup_cosine" | "warmup_linear"
        — warmup_steps of linear warmup then decay over total_steps.
        remat: rematerialize the forward under jax.checkpoint — the
        backward recomputes activations instead of storing them, trading
        ~1 extra forward of FLOPs for the activation memory (the
        standard TPU HBM-for-FLOPs lever for long-sequence training).
        remat="dots" uses the dots_with_no_batch_dims_saveable policy:
        matmul outputs are kept, only elementwise chains and the
        (B,H,S,S) attention scores are recomputed — near-zero extra MXU
        work for most of the memory win.
        fsdp: ZeRO-3-style sharded training — every large parameter
        (and, by GSPMD propagation, its gradient and optimizer state)
        is sharded over the `dp` mesh axis ON TOP of any tp split from
        `rules` (parallel.mesh.fsdp_shardings), cutting weight+Adam HBM
        to 1/dp per device; XLA inserts the per-layer all-gathers and
        grad reduce-scatters that torch FSDP schedules by hand.
        lora_rank > 0: LoRA fine-tuning — low-rank A·B bypasses are
        injected around the 2-D weight MatMuls (milli.transforms.
        inject_lora); ONLY the adapters are trained, the base weights
        are frozen device-side constants of the step program (reference
        examples/rwkv_lora_train.rs). lora_targets restricts injection
        to weight names containing any of the given substrings."""
        from ..backends.xla.compiler import _trace_graph, ensure_x64

        ensure_x64()
        self.model = model
        milli, weight_inputs = model.graph.to_milli(bake_small_constants=False)
        self.milli = milli
        self.weight_names = [n for n in milli.inputs if n in weight_inputs]
        self.data_names = [n for n in milli.inputs if n not in weight_inputs]
        self.lora_rank = lora_rank
        self._lora_init: Dict[str, np.ndarray] = {}
        if lora_rank > 0:
            from ..milli.transforms import inject_lora

            targets = [n for n in self.weight_names
                       if lora_targets is None
                       or any(t in n for t in lora_targets)]
            self._lora_init = inject_lora(
                milli, targets, rank=lora_rank,
                weight_getter=lambda n: model.graph.store.get_numeric(
                    n, param_dtype).numpy(),
                alpha=lora_alpha)
            if not self._lora_init:
                raise ValueError(
                    "lora_rank set but no 2-D weight MatMul matched "
                    f"lora_targets={lora_targets!r}")
        self._quantized_base = {}
        if quantize_base is not None:
            if quantize_base != "int8":
                raise ValueError(f"quantize_base={quantize_base!r}")
            if lora_rank == 0:
                raise ValueError("quantize_base needs lora_rank > 0 "
                                 "(only a frozen base can be quantized)")
            from ..milli.transforms import quantize_matmul_weights

            self._quantized_base = quantize_matmul_weights(
                milli, self.weight_names,
                lambda n: model.graph.store.get_numeric(
                    n, DType.F32).numpy())
        self._fn = _trace_graph(milli, {})
        self._order = list(milli.inputs)
        self.mesh = mesh
        self.param_dtype = param_dtype
        self.compute_dtype = compute_dtype
        self.lr = lr

        import optax

        self.remat = remat
        if lr_schedule is None:
            lr_arg = lr
        elif lr_schedule == "warmup_cosine":
            lr_arg = optax.warmup_cosine_decay_schedule(
                0.0, lr, max(warmup_steps, 1),
                max(total_steps, warmup_steps + 1))
        elif lr_schedule == "warmup_linear":
            lr_arg = optax.join_schedules(
                [optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
                 optax.linear_schedule(
                     lr, 0.0, max(total_steps - warmup_steps, 1))],
                [max(warmup_steps, 1)])
        else:
            raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
        if optimizer == "adamw":
            self.tx = optax.adamw(lr_arg, weight_decay=weight_decay)
        elif optimizer == "adam":
            self.tx = optax.adam(lr_arg)
        elif optimizer == "sgd":
            self.tx = optax.sgd(lr_arg)
        elif optimizer == "sgd_momentum":
            self.tx = optax.sgd(lr_arg, momentum=0.9)
        else:
            raise ValueError(optimizer)
        if grad_clip:
            self.tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                                  self.tx)
        if accum_steps > 1:
            self.tx = optax.MultiSteps(self.tx, accum_steps)

        self.fsdp = fsdp and mesh is not None
        self.fsdp_min_size = fsdp_min_size
        if mesh is not None:
            from ..parallel.mesh import GPT2_RULES, weight_shardings

            self._rules = rules if rules is not None else GPT2_RULES
            if self.fsdp:
                # needs weight shapes — resolved lazily in init_params
                self.param_shardings = None
            else:
                self.param_shardings = weight_shardings(
                    self.weight_names, mesh, self._rules)
        else:
            self.param_shardings = None
        self._step_fn = None

    # ------------------------------------------------------------------
    def init_params(self) -> Dict[str, Any]:
        """The TRAINED parameter pytree: all weights normally; only the
        LoRA adapters when lora_rank is set (base weights are frozen —
        see _frozen_params)."""
        import jax

        if self.lora_rank > 0:
            return {n: jax.device_put(
                v.astype(self.param_dtype.to_numpy(), copy=False))
                for n, v in self._lora_init.items()}
        params = {}
        for i, n in enumerate(self.weight_names):
            host = self.model.graph.store.get_numeric(
                n, self.param_dtype).numpy()
            host = host.astype(self.param_dtype.to_numpy(), copy=False)
            sh = self._shard_for(i, n, host.shape)
            params[n] = (jax.device_put(host, sh) if sh is not None
                         else jax.device_put(host))
        return params

    def _shard_for(self, i: int, name: str, shape):
        """Per-weight sharding, computed lazily and streamed (fsdp needs
        the shape, which is only known once the weight loads; one weight
        is resident on the host at a time)."""
        if self.fsdp:
            if self.param_shardings is None:
                self.param_shardings = [None] * len(self.weight_names)
            if self.param_shardings[i] is None:
                from ..parallel.mesh import fsdp_shardings

                self.param_shardings[i] = fsdp_shardings(
                    [name], [shape], self.mesh, rules=self._rules,
                    min_size=self.fsdp_min_size)[0]
            return self.param_shardings[i]
        return (self.param_shardings[i]
                if self.param_shardings is not None else None)

    def _frozen_params(self) -> Dict[str, Any]:
        """LoRA mode: the frozen base weights, uploaded once and passed
        to the step program as non-donated inputs (never retraced,
        never updated, no optimizer state)."""
        import jax

        if self.lora_rank == 0:
            return {}
        if getattr(self, "_frozen_cache", None) is None:
            frozen = {}
            for i, n in enumerate(self.weight_names):
                if n in self._quantized_base:
                    w_i8, scale = self._quantized_base[n]
                    frozen[n] = jax.device_put(w_i8)
                    frozen[f"{n}::scale"] = jax.device_put(scale)
                    continue
                host = self.model.graph.store.get_numeric(
                    n, self.param_dtype).numpy()
                host = host.astype(self.param_dtype.to_numpy(), copy=False)
                sh = self._shard_for(i, n, host.shape)
                frozen[n] = (jax.device_put(host, sh) if sh is not None
                             else jax.device_put(host))
            self._frozen_cache = frozen
        return self._frozen_cache

    def init_opt_state(self, params):
        import jax

        return jax.jit(self.tx.init)(params)

    # ------------------------------------------------------------------
    def _forward(self, params: Dict[str, Any], ids, frozen=None):
        if self.compute_dtype is not None:
            import jax

            cdt = self.compute_dtype.to_jax()

            def cast(d):
                # quant scales stay f32: an int8 base's accuracy rides
                # entirely on its per-channel scales
                return {k: (v.astype(cdt) if jax.numpy.issubdtype(
                    v.dtype, jax.numpy.floating)
                    and not k.endswith("::scale") else v)
                    for k, v in d.items()}

            params = cast(params)
            frozen = cast(frozen) if frozen else frozen
        by_name = dict(frozen or {})
        by_name.update(params)
        by_name["input_ids"] = ids
        args = [by_name[n] for n in self._order]
        # the forward will be differentiated: the Pallas flash-attention
        # kernel has no VJP rule, so trace the XLA attention path here
        from ..backends.pallas.attention import pallas_attention_disabled

        with pallas_attention_disabled():
            outs = self._fn(*args)
        named = dict(zip(self.milli.outputs, outs))
        return named["logits"]

    def loss_fn(self, params, ids, targets, frozen=None):
        import jax
        import jax.numpy as jnp

        if self.remat == "dots":
            # selective remat: keep matmul/einsum outputs (the MXU work
            # worth not repeating), recompute everything elementwise —
            # and, critically, the (B,H,S,S) attention-score dots DO
            # have batch dims so they are recomputed, not stored. This
            # frees the per-layer score tensors that cap the trainable
            # batch at width >= 1536 while re-running ~no matmul FLOPs.
            fwd = jax.checkpoint(
                self._forward,
                policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)
        elif self.remat:
            fwd = jax.checkpoint(self._forward)
        else:
            fwd = self._forward
        logits = fwd(params, ids, frozen).astype(jnp.float32)
        # logsumexp form: nll = lse(logits) - logits[target]. Same math
        # as log_softmax+gather but never materializes the full f32
        # (B, S, V) log-prob tensor — at 124M the vocab dominates HBM
        # traffic and this is the loss side of that wall.
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, targets[..., None],
                                   axis=-1)[..., 0]
        return (lse - gold).mean()

    def _build_step(self):
        import jax

        from ..compile_cache import enable_persistent_cache

        enable_persistent_cache()

        def step(params, opt_state, ids, targets, frozen):
            loss, grads = jax.value_and_grad(self.loss_fn)(
                params, ids, targets, frozen)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            if self.fsdp and self.param_shardings is not None:
                # pin updated params to their dp-sharded placement so
                # GSPMD reduce-scatters grads and keeps weights + Adam
                # state at 1/dp per device instead of re-replicating.
                # LoRA adapters aren't in weight_names (they're tiny and
                # replicated) — only constrain keys that have a sharding
                sh = {k: s for k, s in zip(self.weight_names,
                                           self.param_shardings)
                      if s is not None}
                params = {k: (jax.lax.with_sharding_constraint(v, sh[k])
                              if k in sh else v)
                          for k, v in params.items()}
            return params, opt_state, loss

        self._step_fn = jax.jit(step, donate_argnums=(0, 1))
        return self._step_fn

    def train_step(self, params, opt_state, ids, targets):
        """One optimizer step. ids/targets: (B, S) int."""
        import jax.numpy as jnp

        if self._step_fn is None:
            self._build_step()
        ids = jnp.asarray(np.asarray(ids, dtype=np.int64))
        targets = jnp.asarray(np.asarray(targets, dtype=np.int64))
        if self.mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec

            # shard batch on dp; sequence on sp only when it divides evenly
            sp_size = dict(zip(self.mesh.axis_names, self.mesh.devices.shape)).get("sp", 1)
            seq_axis = "sp" if ids.shape[1] % max(sp_size, 1) == 0 else None
            data_sh = NamedSharding(self.mesh, PartitionSpec("dp", seq_axis))
            ids = jax.device_put(ids, data_sh)
            targets = jax.device_put(targets, data_sh)
        return self._step_fn(params, opt_state, ids, targets,
                             self._frozen_params())
