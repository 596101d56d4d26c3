"""Expert parallelism (EP) for MoE layers — GShard-style dense dispatch.

Net-new vs the reference (SURVEY.md §2.6): the reference evaluates the
DeepSeek MoE densely on one device (every expert runs for every token,
gated — src/sgraph ops + import recipe; see
importers/recipes/llm/deepseek.py here for the graph-level equivalent).
This module is the scaled TPU execution path: expert weights stacked on
a leading E axis and sharded over the mesh's `ep` axis; routing is
expressed as einsums against one-hot dispatch/combine tensors so GSPMD
lowers token movement to all-to-all-style collectives over ICI — no
per-expert Python loop, fully jittable, static shapes (capacity-based).

Pipeline per token batch (T tokens, E experts, capacity C):
  router logits (T,E) -> top-k gates -> dispatch (T,E,C) one-hot /
  combine (T,E,C) weights -> expert inputs (E,C,D) [sharded on E] ->
  batched SwiGLU FFN -> combine back to (T,D).

Tokens beyond an expert's capacity are dropped (contribute zero), the
standard trade for static shapes; capacity_factor ≥ E/k guarantees no
drops (C = ceil(T·k·cf / E)).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple


def moe_capacity(n_tokens: int, n_experts: int, k: int,
                 capacity_factor: float = 1.25) -> int:
    """Per-expert token capacity; multiples of 8 tile better on the MXU."""
    c = int(math.ceil(n_tokens * k * capacity_factor / n_experts))
    return max(8, ((c + 7) // 8) * 8) if n_tokens >= 8 else max(1, c)


def top_k_dispatch(logits, k: int, capacity: int, norm_topk: bool = True,
                   scale: float = 1.0):
    """Build dispatch/combine tensors from router logits (T, E).

    Returns (dispatch (T,E,C) f32 one-hot, combine (T,E,C) f32).
    Gate weights are softmax probabilities of the selected experts,
    renormalized over the top-k when norm_topk (DeepSeek
    norm_topk_prob semantics), times `scale` (routed_scaling_factor).
    """
    import jax
    import jax.numpy as jnp

    T, E = logits.shape
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(gates, k)                  # (T, k)
    mask = jax.nn.one_hot(topi, E, dtype=jnp.float32).sum(axis=1)  # (T, E)
    sel = gates * mask
    if norm_topk:
        sel = sel / jnp.maximum(sel.sum(-1, keepdims=True), 1e-20)
    sel = sel * scale
    # position of each token in its expert's buffer (first-come order)
    pos = jnp.cumsum(mask, axis=0) * mask - 1.0           # (T, E), -1 if unrouted
    keep = (pos >= 0) & (pos < capacity)
    dispatch = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                              dtype=jnp.float32) * keep[..., None]
    combine = dispatch * sel[..., None]
    return dispatch, combine


def moe_ffn(x, router_w, w_gate, w_up, w_down, k: int,
            capacity: Optional[int] = None, capacity_factor: float = 1.25,
            norm_topk: bool = True, scale: float = 1.0):
    """Top-k routed SwiGLU MoE over stacked expert weights.

    x: (T, D) tokens.  router_w: (E, D).
    w_gate, w_up: (E, D, F); w_down: (E, F, D) — shard axis 0 on `ep`.
    """
    import jax.numpy as jnp

    T, D = x.shape
    E = router_w.shape[0]
    C = capacity if capacity is not None else moe_capacity(
        T, E, k, capacity_factor)
    logits = jnp.einsum("td,ed->te", x.astype(jnp.float32),
                        router_w.astype(jnp.float32))
    dispatch, combine = top_k_dispatch(logits, k, C, norm_topk=norm_topk,
                                       scale=scale)
    xin = jnp.einsum("tec,td->ecd", dispatch.astype(x.dtype), x,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    g = jnp.einsum("ecd,edf->ecf", xin, w_gate,
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("ecd,edf->ecf", xin, w_up,
                   preferred_element_type=jnp.float32)
    h = (g * jnp.reciprocal(1.0 + jnp.exp(-g)) * u).astype(x.dtype)
    out_e = jnp.einsum("ecf,efd->ecd", h, w_down,
                       preferred_element_type=jnp.float32)
    return jnp.einsum("tec,ecd->td", combine, out_e).astype(x.dtype)


def moe_param_specs() -> Dict[str, Tuple]:
    """PartitionSpecs for the stacked expert weights: experts over `ep`,
    FFN hidden over `tp` (megatron column/row split inside each expert)."""
    return {
        "router_w": (None, None),
        "w_gate": ("ep", None, "tp"),
        "w_up": ("ep", None, "tp"),
        "w_down": ("ep", "tp", None),
    }


def shard_moe_params(params: Dict, mesh) -> Dict:
    """Place a {router_w, w_gate, w_up, w_down} dict onto the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    specs = moe_param_specs()
    avail = set(mesh.axis_names)
    out = {}
    for name, v in params.items():
        spec = tuple(a if a in avail else None for a in specs[name])
        out[name] = jax.device_put(v, NamedSharding(mesh, PartitionSpec(*spec)))
    return out


def load_balance_loss(logits, k: int):
    """Switch-Transformer auxiliary load-balance loss: E * sum_e f_e * P_e
    where f_e = fraction of tokens whose top-k picks expert e and
    P_e = mean router probability of e. Equals 1.0 under a perfectly
    uniform router; differentiable through P (f uses a stop-gradient
    one-hot count, as in the paper)."""
    import jax
    import jax.numpy as jnp

    T, E = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    _, topi = jax.lax.top_k(probs, k)
    counts = jax.lax.stop_gradient(
        jax.nn.one_hot(topi, E, dtype=jnp.float32).sum(axis=(0, 1)))
    f = counts / (T * k)
    P = probs.mean(axis=0)
    return E * jnp.sum(f * P)


def moe_ffn_with_aux(x, router_w, w_gate, w_up, w_down, k: int,
                     capacity=None, capacity_factor: float = 1.25,
                     norm_topk: bool = True, scale: float = 1.0,
                     aux_weight: float = 0.01):
    """moe_ffn plus the weighted auxiliary loss — the training form.
    Returns (output, aux_loss)."""
    import jax.numpy as jnp

    logits = jnp.einsum("td,ed->te", x.astype(jnp.float32),
                        router_w.astype(jnp.float32))
    out = moe_ffn(x, router_w, w_gate, w_up, w_down, k=k, capacity=capacity,
                  capacity_factor=capacity_factor, norm_topk=norm_topk,
                  scale=scale)
    return out, aux_weight * load_balance_loss(logits, k)
