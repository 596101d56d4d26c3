"""Training checkpoint save/resume.

The reference has NO training checkpointing (SURVEY.md §5: optimizer
state lives in caller-held tensors). Here it's first-class: params +
optimizer state + step/metadata serialize to a single .npz (portable,
no framework lock-in); sharded arrays gather transparently on save and
re-shard on load when a mesh is provided.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _flatten(tree, prefix=""):
    """Flatten a pytree of arrays into {path: array} (dicts/lists/tuples)."""
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}__seq__"] = np.asarray(
            ["list" if isinstance(tree, list) else "tuple", str(len(tree))],
            dtype=object)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        out[f"{prefix}__none__"] = np.zeros(0)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    # rebuild nested structure from path keys
    root: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        if "__none__" in node:
            return None
        if "__seq__" in node:
            kind, n = node["__seq__"]
            items = [rebuild(node[str(i)]) for i in range(int(n))]
            return items if kind == "list" else tuple(items)
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


def save_checkpoint(path: str, params: Dict[str, Any], opt_state: Any,
                    step: int, extra: Optional[Dict[str, Any]] = None) -> None:
    """opt_state may be any pytree (optax NamedTuple states included):
    it is stored as an ordered leaves list and re-attached to a fresh
    treedef on load (`opt_state_like`)."""
    import jax

    flat = {}
    flat.update(_flatten({"params": {k: np.asarray(v) for k, v in params.items()}}))
    opt_leaves = [np.asarray(x) for x in jax.tree.leaves(opt_state)]
    flat.update(_flatten({"opt": opt_leaves}))
    meta = {"step": int(step), "extra": extra or {}}
    np.savez(path, __meta__=np.asarray(json.dumps(meta)), **flat)


def load_checkpoint(path: str, opt_state_like: Any = None, mesh=None,
                    param_shardings=None, param_order=None
                    ) -> Tuple[Dict[str, Any], Any, int, Dict]:
    """opt_state_like: a freshly-initialized optimizer state whose treedef
    receives the stored leaves (returns the raw leaves list when omitted)."""
    import jax

    with np.load(path, allow_pickle=True) as z:
        meta = json.loads(str(z["__meta__"]))
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    tree = _unflatten(flat)
    params = tree["params"]
    opt_leaves = list(tree["opt"])
    if opt_state_like is not None:
        treedef = jax.tree.structure(opt_state_like)
        opt_state = jax.tree.unflatten(treedef, opt_leaves)
    else:
        opt_state = opt_leaves
    if mesh is not None and param_shardings is not None and param_order is not None:
        by_name = dict(zip(param_order, param_shardings))
        params = {k: jax.device_put(v, by_name[k]) if k in by_name else v
                  for k, v in params.items()}
    return params, opt_state, meta["step"], meta["extra"]
