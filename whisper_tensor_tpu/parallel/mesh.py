"""Device mesh + sharding-rule layer.

Net-new relative to the reference (which is single-device; SURVEY.md
§2.6): DP/TP/SP expressed as jax.sharding over a named Mesh; XLA/GSPMD
inserts the collectives (psum/all-gather/reduce-scatter) over ICI.
Axis conventions:
  dp — data parallel (batch)
  sp — sequence parallel (activations' sequence dim; a.k.a. context)
  tp — tensor parallel (hidden/heads; megatron-style column/row splits)
  pp — pipeline parallel (layer groups; round-2: shard_map pipeline)
  ep — expert parallel (MoE experts; arrives with the deepseek recipe)
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

AXES = ("dp", "sp", "tp")


def make_mesh(dp: int = 1, sp: int = 1, tp: int = 1, ep: int = 1,
              devices=None):
    """Build a Mesh with the standard (dp, sp, tp) axes, plus an `ep`
    axis when expert parallelism is requested (ep > 1)."""
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    n = dp * sp * tp * ep
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if ep > 1:
        arr = np.asarray(devices[:n]).reshape(dp, sp, tp, ep)
        return Mesh(arr, ("dp", "sp", "tp", "ep"))
    arr = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))


def auto_mesh(n_devices: int):
    """Reasonable default factorization: tp innermost (ICI-adjacent),
    then dp; sp=1 unless n is large."""
    tp = 1
    for cand in (8, 4, 2):
        if n_devices % cand == 0:
            tp = cand
            break
    dp = n_devices // tp
    return make_mesh(dp=dp, sp=1, tp=tp)


def named(mesh, *spec):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec(*spec))


# ---------------------------------------------------------------------------
# per-weight sharding rules (pattern -> PartitionSpec), megatron-style:
# column-parallel for up-projections (shard output dim on tp), row-parallel
# for down-projections (shard input dim on tp), embeddings sharded on vocab.
# ---------------------------------------------------------------------------

GPT2_RULES: List[Tuple[str, Tuple]] = [
    (r"^wte$", ("tp", None)),           # (V, E): shard vocab
    (r"^wte_t$", (None, "tp")),         # (E, V)
    (r"^wpe$", (None, None)),
    (r"^wqkv_\d+$", (None, "tp")),      # (E, 3E) column-parallel
    (r"^bqkv_\d+$", ("tp",)),
    (r"^wproj_\d+$", ("tp", None)),     # (E, E) row-parallel
    (r"^bproj_\d+$", (None,)),
    (r"^wfc_\d+$", (None, "tp")),       # (E, 4E) column-parallel
    (r"^bfc_\d+$", ("tp",)),
    (r"^wmp_\d+$", ("tp", None)),       # (4E, E) row-parallel
    (r"^bmp_\d+$", (None,)),
    (r"^ln\w*_?\d*$", None),            # norm params replicated
]

LLAMA_RULES: List[Tuple[str, Tuple]] = [
    (r"embed", ("tp", None)),
    (r"(wq|wk|wv|w_qkv)_", (None, "tp")),
    (r"(wo|w_o)_", ("tp", None)),
    (r"(w_gate|w_up|w1|w3)_", (None, "tp")),
    (r"(w_down|w2)_", ("tp", None)),
    (r"lm_head", (None, "tp")),
    (r"norm", None),
]


def weight_shardings(names: Sequence[str], mesh,
                     rules: List[Tuple[str, Optional[Tuple]]]):
    """Map weight names to NamedShardings via the first matching rule;
    unmatched weights are replicated."""
    from jax.sharding import NamedSharding, PartitionSpec

    out = []
    for n in names:
        spec: Optional[Tuple] = None
        for pat, s in rules:
            if re.search(pat, n):
                spec = s
                break
        if spec is None:
            out.append(NamedSharding(mesh, PartitionSpec()))
        else:
            out.append(NamedSharding(mesh, PartitionSpec(*spec)))
    return out


def fsdp_shardings(names: Sequence[str], shapes: Sequence[Tuple[int, ...]],
                   mesh, rules: Optional[List[Tuple[str, Optional[Tuple]]]]
                   = None, axis: str = "dp", min_size: int = 2 ** 16):
    """ZeRO-3 / FSDP-style parameter shardings: every sufficiently
    large weight is sharded over the data-parallel axis (in addition
    to any tensor-parallel split from `rules`), so parameters,
    gradients, and optimizer state all cost 1/dp of their replicated
    HBM. GSPMD then inserts the per-layer all-gather (forward/backward)
    and reduce-scatter (grad) collectives that hand-written FSDP
    implementations schedule manually.

    Net-new vs the reference (single-device — SURVEY.md §2.6); the
    sharded-optimizer role of torch FSDP/ZeRO expressed as nothing but
    placement: pick a dim, annotate, let XLA do the wrapping.

    For each weight: start from the first matching TP rule spec (or
    replicated), then place `axis` on the LARGEST dim that is still
    unsharded and divides evenly. Weights smaller than min_size
    elements stay on their base spec (norms/biases — the all-gather
    latency isn't worth the bytes, same heuristic as torch FSDP's
    min_num_params wrapping policy)."""
    from jax.sharding import NamedSharding, PartitionSpec

    n_shard = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)
    out = []
    for name, shape in zip(names, shapes):
        spec: Optional[Tuple] = None
        for pat, s in (rules or []):
            if re.search(pat, name):
                spec = s
                break
        base = list(spec) if spec is not None else [None] * len(shape)
        base += [None] * (len(shape) - len(base))
        if n_shard > 1 and int(np.prod(shape, dtype=np.int64)) >= min_size:
            cands = [d for d in range(len(shape))
                     if base[d] is None and shape[d] % n_shard == 0]
            if cands:
                d = max(cands, key=lambda d: shape[d])
                base[d] = axis
        out.append(NamedSharding(mesh, PartitionSpec(*base)))
    return out


def shard_array(arr, sharding):
    import jax

    return jax.device_put(arr, sharding)


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host entry: initialize the jax distributed runtime (each
    host calls this once before any jax use; args default to the
    standard JAX env vars / TPU metadata autodetection). After it
    returns, jax.devices() is the GLOBAL device list and the mesh
    helpers below span hosts."""
    import jax

    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def multihost_mesh(dp_hosts: Optional[int] = None, sp: int = 1, tp: int = 1):
    """Mesh layout for multi-host pods: the dp axis spans hosts (its
    collectives ride DCN, which gradient all-reduce tolerates) while
    sp/tp stay INSIDE a host's ICI domain. dp_hosts defaults to the
    process count; local devices must factor as dp_local*sp*tp."""
    import jax

    devices = jax.devices()
    n_local = jax.local_device_count()
    n_hosts = jax.process_count() if dp_hosts is None else dp_hosts
    if n_local % (sp * tp) != 0:
        raise ValueError(f"local devices {n_local} not divisible by "
                         f"sp*tp={sp * tp}")
    dp = n_hosts * (n_local // (sp * tp))
    return make_mesh(dp=dp, sp=sp, tp=tp, devices=devices)
