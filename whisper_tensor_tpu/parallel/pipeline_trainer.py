"""dp x pp x tp composed training: GPipe pipeline inside the trainer.

Net-new vs the reference (SURVEY.md §2.6; VERDICT r2 #8 asked for pp
composed into the trainer rather than existing only as a library fn).

Design: pipeline parallelism needs identical per-stage programs (the
GPipe schedule scans one stage_fn over layer groups), so the trainer
consumes a LAYERED description of the LM — embed_fn / block_fn /
head_fn with per-layer block params stacked on a leading L axis — not
the flat imported milli graph (whose layer structure ONNX erases).
`layered_gpt2` builds that description from the same weight dict the
gpt2 recipe uses, with megatron TP inside the block (qkv/fc column-
sharded, proj/mp row-sharded, psum over `tp` after each row-sharded
matmul — manual collectives, since the block executes inside the
pipeline's shard_map region). The pipeline rides `pp` via
parallel.pipeline.pipeline_apply (ppermute over ICI), microbatch rows
shard over `dp`, and the whole train step jits into ONE XLA program.

Gradients flow through the schedule (shard_map + ppermute + psum are
all differentiable); optax runs on the stacked pytree, so optimizer
state inherits the (pp, tp) weight shardings.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import numpy as np


class LayeredLM(NamedTuple):
    """A pipeline-stageable LM: logits = head(h_L), h_l = block(p_l, h_{l-1}),
    h_0 = embed(ids)."""

    embed_fn: Callable          # (embed_params, ids) -> h (B,S,D)
    block_fn: Callable          # (block_params_one_layer, h) -> h
    head_fn: Callable           # (head_params, h) -> logits
    embed_params: Dict[str, Any]
    block_params: Dict[str, Any]   # leaves stacked (L, ...)
    head_params: Dict[str, Any]
    block_specs: Optional[Dict[str, Any]] = None  # tp PartitionSpecs


def _ln(h, g, b, eps=1e-5):
    import jax.numpy as jnp

    mu = h.mean(-1, keepdims=True)
    v = ((h - mu) ** 2).mean(-1, keepdims=True)
    return (h - mu) / jnp.sqrt(v + eps) * g + b


def layered_gpt2(cfg, weight_getter,
                 tp_axis: Optional[str] = None) -> LayeredLM:
    """Build a LayeredLM from a gpt2 HF-layout weight getter (the same
    callable importers.recipes.llm.gpt2.build_gpt2_* consume, e.g.
    random_gpt2_weights(cfg)). tp_axis: mesh axis name for megatron
    tensor parallelism inside the block (None = no tp)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    H, D = cfg.n_head, cfg.n_embd
    hd = D // H

    def embed_fn(p, ids):
        S = ids.shape[1]
        return p["wte"][ids] + p["wpe"][:S][None]

    def block_fn(p, h):
        # wqkv columns are stored per-head-interleaved ([q_h k_h v_h]
        # for each head, see the stacking below) so a contiguous tp
        # column shard carries complete heads — the local slice runs
        # attention over its H/tp heads with no cross-chip traffic
        x = _ln(h, p["ln1g"], p["ln1b"])
        qkv = x @ p["wqkv"] + p["bqkv"]          # (B,S,3*D/tp)
        Hl = qkv.shape[-1] // (3 * hd)
        B, S = x.shape[:2]
        t = qkv.reshape(B, S, Hl, 3, hd).transpose(0, 2, 3, 1, 4)
        q, k, v = t[:, :, 0], t[:, :, 1], t[:, :, 2]   # (B,Hl,S,hd)
        # python-float scale: a np.float64 scalar would promote the
        # whole block to f64 under the framework's x64 mode
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (1.0 / float(np.sqrt(hd)))
        mask = jnp.tril(jnp.ones((S, S), bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
        att = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, Hl * hd)
        proj = ctx @ p["wproj"]                  # row-sharded: partial sum
        if tp_axis is not None:
            proj = jax.lax.psum(proj, tp_axis)
        h = h + proj + p["bproj"]
        x2 = _ln(h, p["ln2g"], p["ln2b"])
        ff = jax.nn.gelu(x2 @ p["wfc"] + p["bfc"], approximate=True)
        mp = ff @ p["wmp"]                       # row-sharded: partial sum
        if tp_axis is not None:
            mp = jax.lax.psum(mp, tp_axis)
        return h + mp + p["bmp"]

    def head_fn(p, h):
        return _ln(h, p["lnfg"], p["lnfb"]) @ p["wte_t"]

    L = cfg.n_layer
    w = lambda name: np.asarray(weight_getter(name))

    def interleave_qkv(t):
        # recipe layout (D, [q|k|v]) -> (D, [q_h k_h v_h per head]) so
        # contiguous tp column shards hold complete heads
        if t.ndim == 2:
            return t.reshape(D, 3, H, hd).transpose(0, 2, 1, 3).reshape(D, 3 * D)
        return t.reshape(3, H, hd).transpose(1, 0, 2).reshape(3 * D)

    hf = {
        "ln1g": "ln_1.weight", "ln1b": "ln_1.bias",
        "wqkv": "attn.c_attn.weight", "bqkv": "attn.c_attn.bias",
        "wproj": "attn.c_proj.weight", "bproj": "attn.c_proj.bias",
        "ln2g": "ln_2.weight", "ln2b": "ln_2.bias",
        "wfc": "mlp.c_fc.weight", "bfc": "mlp.c_fc.bias",
        "wmp": "mlp.c_proj.weight", "bmp": "mlp.c_proj.bias",
    }

    def get(key, i):
        t = w(f"transformer.h.{i}.{hf[key]}")
        return interleave_qkv(t) if key in ("wqkv", "bqkv") else t

    stack = lambda key: np.stack([get(key, i) for i in range(L)])
    block_params = {k: stack(k) for k in hf}
    tp = tp_axis
    block_specs = {
        "ln1g": P(), "ln1b": P(),
        "wqkv": P(None, tp), "bqkv": P(tp),
        "wproj": P(tp, None), "bproj": P(),
        "ln2g": P(), "ln2b": P(),
        "wfc": P(None, tp), "bfc": P(tp),
        "wmp": P(tp, None), "bmp": P(),
    } if tp is not None else None
    wte = w("transformer.wte.weight")
    return LayeredLM(
        embed_fn, block_fn, head_fn,
        embed_params={"wte": wte, "wpe": w("transformer.wpe.weight")},
        block_params=block_params,
        head_params={"lnfg": w("transformer.ln_f.weight"),
                     "lnfb": w("transformer.ln_f.bias"),
                     "wte_t": wte.T.copy()},
        block_specs=block_specs)


class PipelinedLMTrainer:
    """Next-token CE trainer over a LayeredLM on a (dp, pp, tp) mesh.

    The block stack rides the GPipe pipeline (pp); microbatch rows shard
    over dp; megatron tp runs inside the block. Embed/head execute
    outside the pipeline region under GSPMD (replicated weights,
    dp-sharded activations)."""

    def __init__(self, layered: LayeredLM, mesh, microbatches: int = 4,
                 lr: float = 3e-4, optimizer: str = "adamw",
                 weight_decay: float = 0.01):
        import optax

        self.lm = layered
        self.mesh = mesh
        self.microbatches = microbatches
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        self.pp = axes.get("pp", 1)
        self.dp_axis = "dp" if axes.get("dp", 1) > 1 else None
        L = next(iter(layered.block_params.values())).shape[0]
        if L % max(self.pp, 1):
            raise ValueError(f"n_layer {L} not divisible by pp {self.pp}")
        if optimizer == "adamw":
            self.tx = optax.adamw(lr, weight_decay=weight_decay)
        elif optimizer == "sgd":
            self.tx = optax.sgd(lr)
        else:
            raise ValueError(optimizer)
        self._step_fn = None

    # -- parameter placement -------------------------------------------
    def init_params(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        lm = self.lm
        rep = NamedSharding(self.mesh, P())

        def put_block(name, v):
            extra = (tuple(lm.block_specs[name])
                     if lm.block_specs is not None else ())
            return jax.device_put(v, NamedSharding(
                self.mesh, P("pp", *extra)))

        return {
            "embed": {k: jax.device_put(np.asarray(v), rep)
                      for k, v in lm.embed_params.items()},
            "block": {k: put_block(k, np.asarray(v))
                      for k, v in lm.block_params.items()},
            "head": {k: jax.device_put(np.asarray(v), rep)
                     for k, v in lm.head_params.items()},
        }

    def init_opt_state(self, params):
        import jax

        return jax.jit(self.tx.init)(params)

    # -- the composed step ---------------------------------------------
    def loss_fn(self, params, ids, targets):
        import jax
        import jax.numpy as jnp

        from .pipeline import pipeline_apply

        h = self.lm.embed_fn(params["embed"], ids)
        h = pipeline_apply(self.lm.block_fn, params["block"], h,
                           self.mesh, axis="pp",
                           microbatches=self.microbatches,
                           param_specs=self.lm.block_specs,
                           batch_axis=self.dp_axis)
        logits = self.lm.head_fn(params["head"], h).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll.mean()

    def _build_step(self):
        import jax
        import optax

        from ..compile_cache import enable_persistent_cache

        enable_persistent_cache()

        def step(params, opt_state, ids, targets):
            loss, grads = jax.value_and_grad(self.loss_fn)(
                params, ids, targets)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step_fn = jax.jit(step, donate_argnums=(0, 1))
        return self._step_fn

    def train_step(self, params, opt_state, ids, targets):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._step_fn is None:
            self._build_step()
        sh = NamedSharding(self.mesh, P(self.dp_axis, None))
        ids = jax.device_put(jnp.asarray(np.asarray(ids, np.int64)), sh)
        targets = jax.device_put(jnp.asarray(np.asarray(targets, np.int64)), sh)
        return self._step_fn(params, opt_state, ids, targets)
