"""PEFT LoRA adapter loading: merge low-rank adapters into base weights
at import time.

A PEFT adapter directory holds `adapter_config.json` (r, lora_alpha,
fan_in_fan_out, use_rslora) and `adapter_model.safetensors` with keys
like `base_model.model.<module>.lora_A.weight` (r, in) and
`...lora_B.weight` (out, r). Merging computes
`W <- W + (alpha/r) * transpose(B @ A, fan_in_fan_out)` — exactly
PEFT's `merge_and_unload()` — so inference costs nothing at runtime.

Reference seam: examples/rwkv_lora_train.rs trains adapters through the
milli training artifact (mirrored by `milli.transforms.inject_lora` +
`LMTrainer(lora_rank=...)`); this module closes the loop by consuming
standard PEFT checkpoints in every loader (`-c lora=<adapter_dir>`).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from .safetensors_io import SafetensorsStore


def _strip_adapter_key(key: str) -> Tuple[str, str] | None:
    """'base_model.model.<mod>.lora_A[.default].weight' -> (<mod>, 'A')."""
    for side in ("A", "B"):
        for mid in (f".lora_{side}.weight", f".lora_{side}.default.weight"):
            if key.endswith(mid):
                mod = key[: -len(mid)]
                for prefix in ("base_model.model.", "base_model."):
                    if mod.startswith(prefix):
                        mod = mod[len(prefix):]
                        break
                return mod, side
    return None


class LoraMergedStore:
    """Wraps a weight store; `load(name)` returns the base weight with
    the adapter's low-rank delta merged in (f32 accumulate, cast back).

    Duck-types the SafetensorsStore surface the loaders use
    (load / __contains__ / names / meta / getter / zeros_getter).
    """

    def __init__(self, base: SafetensorsStore, adapter_dir: str):
        self.base = base
        cfg_path = os.path.join(adapter_dir, "adapter_config.json")
        with open(cfg_path, "r", encoding="utf-8") as f:
            cfg = json.load(f)
        r = int(cfg.get("r", 8))
        alpha = float(cfg.get("lora_alpha", r))
        self.scale = (alpha / np.sqrt(r) if cfg.get("use_rslora")
                      else alpha / r)
        self.fan_in_fan_out = bool(cfg.get("fan_in_fan_out", False))

        st = os.path.join(adapter_dir, "adapter_model.safetensors")
        if os.path.exists(st):
            self._adapter = SafetensorsStore([st])
        else:
            raise FileNotFoundError(
                f"no adapter_model.safetensors in {adapter_dir}")
        # module path -> {"A": key, "B": key}
        self._ab: Dict[str, Dict[str, str]] = {}
        for key in self._adapter.names():
            hit = _strip_adapter_key(key)
            if hit is None:
                continue
            mod, side = hit
            self._ab.setdefault(mod, {})[side] = key
        incomplete = [m for m, s in self._ab.items() if len(s) != 2]
        if incomplete:
            raise ValueError(f"adapter pairs missing A or B: {incomplete}")
        self.merged_modules = sorted(self._ab)

    # -- store surface -------------------------------------------------
    def names(self):
        return self.base.names()

    def __contains__(self, name):
        return name in self.base

    def meta(self, name: str):
        return self.base.meta(name)

    def load(self, name: str) -> np.ndarray:
        arr = self.base.load(name)
        if not name.endswith(".weight"):
            return arr
        mod = name[: -len(".weight")]
        keys = self._ab.get(mod)
        if keys is None:
            return arr
        a = self._adapter.load(keys["A"]).astype(np.float32)  # (r, in)
        b = self._adapter.load(keys["B"]).astype(np.float32)  # (out, r)
        delta = self.scale * (b @ a)                          # (out, in)
        if self.fan_in_fan_out:   # Conv1D layout: base weight is (in, out)
            delta = delta.T
        if delta.shape != arr.shape:
            raise ValueError(
                f"adapter delta {delta.shape} does not match base weight "
                f"{name} {arr.shape} (fan_in_fan_out="
                f"{self.fan_in_fan_out})")
        return (arr.astype(np.float32) + delta).astype(arr.dtype)

    def getter(self, transform=None):
        def get(name: str) -> np.ndarray:
            arr = self.load(name)
            return transform(name, arr) if transform else arr

        return get

    def zeros_getter(self):
        return self.base.zeros_getter()


def load_peft_adapter_arrays(adapter_dir: str,
                             weight_map: Dict[str, str]):
    """PEFT dir -> {milli_weight_input: (A (K,r), B (r,N), scale)} for
    per-row multi-LoRA serving (`milli.transforms.inject_multi_lora`).

    weight_map is the recipe's {initializer_name: hf_state_dict_name}
    record for matmul-RHS weights. Orientation: the milli RHS is
    W_hf.T for Linear recipes (and W_hf for GPT-2 Conv1D, whose PEFT
    adapters carry fan_in_fan_out); in BOTH cases the milli-layout
    delta is A_peft.T @ B_peft.T * scale, so A = A_peft.T, B = B_peft.T.
    """
    cfg_path = os.path.join(adapter_dir, "adapter_config.json")
    with open(cfg_path, "r", encoding="utf-8") as f:
        cfg = json.load(f)
    r = int(cfg.get("r", 8))
    alpha = float(cfg.get("lora_alpha", r))
    scale = (alpha / np.sqrt(r) if cfg.get("use_rslora") else alpha / r)
    st = os.path.join(adapter_dir, "adapter_model.safetensors")
    if not os.path.exists(st):
        raise FileNotFoundError(f"no adapter_model.safetensors in "
                                f"{adapter_dir}")
    ad = SafetensorsStore([st])
    ab: Dict[str, Dict[str, str]] = {}
    for key in ad.names():
        hit = _strip_adapter_key(key)
        if hit is None:
            continue
        mod, side = hit
        ab.setdefault(mod, {})[side] = key
    rev = {hf: init for init, hf in weight_map.items()}
    out: Dict[str, tuple] = {}
    unmatched = []
    for mod, keys in sorted(ab.items()):
        if len(keys) != 2:
            raise ValueError(f"adapter module {mod} missing A or B")
        init = rev.get(mod + ".weight")
        if init is None:
            unmatched.append(mod)
            continue
        a = ad.load(keys["A"]).astype(np.float32)   # (r, in)
        b = ad.load(keys["B"]).astype(np.float32)   # (out, r)
        out[init] = (np.ascontiguousarray(a.T),
                     np.ascontiguousarray(b.T), float(scale))
    if unmatched:
        # strict: serving a PARTIAL adapter would silently diverge from
        # the merge-at-load (`lora=<dir>`) path
        raise ValueError(
            f"adapter modules {unmatched} have no matmul-weight mapping "
            f"in this model (mapped: {sorted(rev)[:8]}...) — the served "
            f"adapter would be partially applied")
    if not out:
        raise ValueError("adapter contains no lora_A/lora_B pairs")
    return out


def save_peft_adapter(adapters: Dict[str, np.ndarray],
                      weight_map: Dict[str, str], rank: int,
                      out_dir: str, alpha: float | None = None) -> str:
    """Write trained adapters as a standard PEFT directory
    (adapter_config.json + adapter_model.safetensors) so they round-trip
    through the loaders (`lora=<dir>` merge-at-load, `serve_adapters`
    multi-LoRA serving, and load_peft_adapter_arrays).

    `adapters` is the LMTrainer/inject_lora naming: `<init>::lora_a`
    (K, r) and `<init>::lora_b` (r, N) pairs in the milli matmul-RHS
    orientation; `weight_map` is the recipe's {initializer_name:
    hf_state_dict_name} record. PEFT stores A as (r, in) and B as
    (out, r), i.e. the transposes.

    Closes the loop the reference aspires to in
    examples/rwkv_lora_train.rs (train adapters, persist, re-serve).
    """
    from safetensors.numpy import save_file

    if alpha is None:
        alpha = float(rank)
    os.makedirs(out_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {}
    modules = set()
    for key, val in adapters.items():
        if key.endswith("::lora_a"):
            init, side = key[:-8], "A"
        elif key.endswith("::lora_b"):
            init, side = key[:-8], "B"
        else:
            continue
        hf = weight_map.get(init)
        if hf is None:
            raise KeyError(f"adapter {key}: no hf mapping for {init!r}")
        mod = hf[:-len(".weight")] if hf.endswith(".weight") else hf
        modules.add(mod)
        arr = np.ascontiguousarray(np.asarray(val, np.float32).T)
        tensors[f"base_model.model.{mod}.lora_{side}.weight"] = arr
    save_file(tensors, os.path.join(out_dir,
                                    "adapter_model.safetensors"))
    cfg = {"peft_type": "LORA", "r": rank, "lora_alpha": alpha,
           "fan_in_fan_out": False, "use_rslora": False,
           "target_modules": sorted(m.rsplit(".", 1)[-1]
                                    for m in modules),
           "task_type": "CAUSAL_LM"}
    with open(os.path.join(out_dir, "adapter_config.json"), "w",
              encoding="utf-8") as f:
        json.dump(cfg, f, indent=1)
    return out_dir
