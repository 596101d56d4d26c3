"""Text inference interface: tokens-in -> logits-out + generation.

Reference equivalent: TextInferenceTokensInLogitOutInterface
(src/interfaces.rs:64-155). TPU redesign: instead of a per-token
SuperGraph Scan interpreting the model graph each step (reference
call stack §3.2), the whole decode loop compiles to ONE jitted program:
  * prefill: step graph at a bucketed prompt length
  * decode: lax.scan over the step graph at S=1, greedy argmax feedback,
    KV caches as donated buffers (in-place DynamicUpdateSlice on TPU)
Weights live on device once; each generate() call is two program
invocations regardless of token count.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..dtype import DType
from ..model import Model


@dataclass(frozen=True)
class SamplingParams:
    """Sampling for the jitted decode loop (reference: the scheduler's
    live generation settings, src/scheduler.rs). temperature==0 means
    greedy. top_k/top_p/min_p restrict the candidate set before the
    categorical draw; repetition_penalty divides positive / multiplies
    negative logits of already-seen tokens (prompt + generated, HF
    semantics); presence_penalty subtracts a flat amount from every
    seen token's logit and frequency_penalty subtracts per occurrence
    (OpenAI mu[j] -= c[j]*alpha_freq + 1[c[j]>0]*alpha_pres, counted
    over prompt + generated text, tracked as a (B, V) int32 count array
    in the scan carry); all of it runs inside the compiled scan."""

    temperature: float = 1.0
    top_k: int = 0                   # 0 = disabled
    top_p: float = 1.0               # 1.0 = disabled
    min_p: float = 0.0               # 0.0 = disabled
    repetition_penalty: float = 1.0  # 1.0 = disabled
    presence_penalty: float = 0.0    # 0.0 = disabled (additive, OpenAI-style)
    frequency_penalty: float = 0.0   # 0.0 = disabled (additive, per count)
    seed: int = 0


def _uses_seen(sp: Optional[SamplingParams]) -> bool:
    """True when the decode scan must carry the (B, V) token-count array
    (repetition / presence / frequency penalties)."""
    return sp is not None and (sp.repetition_penalty != 1.0
                               or sp.presence_penalty != 0.0
                               or sp.frequency_penalty != 0.0)


def _filtered_logits(logits, sp: SamplingParams):
    """Temperature/top-k/top-p/min-p-adjusted (B, V) f32 logits — softmax
    of the result IS the sampling distribution _pick_token draws from."""
    import jax
    import jax.numpy as jnp

    lg = logits.astype(jnp.float32) / sp.temperature
    if sp.top_k:
        kth = jax.lax.top_k(lg, sp.top_k)[0][..., -1:]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    if sp.top_p < 1.0:
        srt = jnp.sort(lg, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        keep = (jnp.cumsum(probs, axis=-1) - probs) <= sp.top_p
        thresh = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                         keepdims=True)
        lg = jnp.where(lg < thresh, -jnp.inf, lg)
    if sp.min_p > 0.0:
        # keep tokens whose probability is at least min_p times the top
        # token's probability (applied after top-k/top-p, HF warper order)
        probs = jax.nn.softmax(lg, axis=-1)
        cut = sp.min_p * jnp.max(probs, axis=-1, keepdims=True)
        lg = jnp.where(probs < cut, -jnp.inf, lg)
    return lg


def _pick_token(logits, key, sp: Optional[SamplingParams], seen=None):
    """(B, V) logits -> (B,) token ids, inside jit. `seen` is the (B, V)
    int32 occurrence-count array (prompt + generated) for the
    repetition / presence / frequency penalties."""
    import jax
    import jax.numpy as jnp

    if sp is not None and seen is not None and _uses_seen(sp):
        lg0 = logits.astype(jnp.float32)
        cnt = seen.astype(jnp.float32)
        emitted = seen > 0
        if sp.repetition_penalty != 1.0:
            pen = jnp.where(lg0 > 0, lg0 / sp.repetition_penalty,
                            lg0 * sp.repetition_penalty)
            lg0 = jnp.where(emitted, pen, lg0)
        # OpenAI-formula additive penalties: presence fires once per
        # distinct seen token, frequency scales with its count
        if sp.presence_penalty != 0.0:
            lg0 = lg0 - sp.presence_penalty * emitted.astype(jnp.float32)
        if sp.frequency_penalty != 0.0:
            lg0 = lg0 - sp.frequency_penalty * cnt
        logits = lg0
    if sp is None or sp.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(key, _filtered_logits(logits, sp), axis=-1)

def _rows_neutral(sp: Optional[SamplingParams]) -> tuple:
    """Per-row sampling parameter vector for one row: the row's own
    SamplingParams, or the neutral (greedy) settings when None."""
    if sp is None:
        return (0.0, 0, 1.0, 0.0, 1.0, 0.0, 0.0, 0)
    return (sp.temperature, sp.top_k, sp.top_p, sp.min_p,
            sp.repetition_penalty, sp.presence_penalty,
            sp.frequency_penalty, sp.seed)


def _rows_flags(sps) -> tuple:
    """Static program-specialization flags over a set of per-row
    SamplingParams: (any_sampled, any_topk, any_topp, any_minp,
    any_pen). The all-False variant compiles to a pure argmax — batched
    greedy traffic pays nothing for per-row sampling support."""
    live = [sp for sp in sps if sp is not None]
    return (any(sp.temperature > 0.0 for sp in live),
            any(sp.top_k > 0 for sp in live),
            any(sp.top_p < 1.0 for sp in live),
            any(sp.min_p > 0.0 for sp in live),
            any(_uses_seen(sp) for sp in live))


def _rows_arrays(sps) -> tuple:
    """Stack per-row SamplingParams into the 8 (B,) arrays
    _pick_token_rows consumes (host numpy; cheap data args that never
    shape-specialize the compiled program)."""
    cols = list(zip(*[_rows_neutral(sp) for sp in sps]))
    return (np.asarray(cols[0], np.float32), np.asarray(cols[1], np.int32),
            np.asarray(cols[2], np.float32), np.asarray(cols[3], np.float32),
            np.asarray(cols[4], np.float32), np.asarray(cols[5], np.float32),
            np.asarray(cols[6], np.float32), np.asarray(cols[7], np.uint32))


def _pick_token_rows(logits, key, rows, flags, seen=None):
    """Per-row sampling: (B, V) logits -> (B,) tokens where EVERY
    sampling knob (temperature/top-k/top-p/min-p/penalties/seed) is a
    per-row array — vLLM-style per-request params inside one batched
    decode program (net-beyond the reference, whose scheduler shares
    one generation config per job; crates/whisper-tensor-server/src/
    scheduler.rs). `flags` is the static specialization tuple from
    _rows_flags; `rows` the arrays from _rows_arrays."""
    import jax
    import jax.numpy as jnp

    temp, topk, topp, minp, rep, pres, freq, seed = rows
    any_sampled, any_topk, any_topp, any_minp, any_pen = flags
    lg = logits.astype(jnp.float32)
    if any_pen and seen is not None:
        cnt = seen.astype(jnp.float32)
        emitted = seen > 0
        pen = jnp.where(lg > 0, lg / rep[:, None], lg * rep[:, None])
        lg = jnp.where(emitted, pen, lg)
        lg = lg - pres[:, None] * emitted.astype(jnp.float32)
        lg = lg - freq[:, None] * cnt
    greedy = jnp.argmax(lg, axis=-1)
    if not any_sampled:
        return greedy
    t = jnp.where(temp > 0, temp, 1.0)
    slg = lg / t[:, None]
    V = lg.shape[-1]
    if any_topk:
        srt = jnp.sort(slg, axis=-1)[:, ::-1]
        kth = jnp.take_along_axis(
            srt, jnp.clip(topk - 1, 0, V - 1).astype(jnp.int32)[:, None],
            axis=1)
        slg = jnp.where((topk[:, None] > 0) & (slg < kth), -jnp.inf, slg)
    if any_topp:
        # HF warper order: top-p ranks the post-top-k distribution
        srt = jnp.sort(slg, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        keep = (jnp.cumsum(probs, axis=-1) - probs) <= topp[:, None]
        thresh = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                         keepdims=True)
        slg = jnp.where(slg < thresh, -jnp.inf, slg)
    if any_minp:
        probs = jax.nn.softmax(slg, axis=-1)
        cut = minp[:, None] * jnp.max(probs, axis=-1, keepdims=True)
        slg = jnp.where((minp[:, None] > 0) & (probs < cut), -jnp.inf, slg)
    # per-row streams: each row's seed folds into the chunk key, so a
    # request's draws are independent of its slot neighbours
    keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(seed)
    sampled = jax.vmap(jax.random.categorical)(keys, slg)
    return jnp.where(temp > 0.0, sampled, greedy)


def _dfa_mask(logits, row, acc_state, eos: int):
    """Constrained decoding (net-new vs the reference): keep only tokens
    the TokenDFA admits from each row's state; eos is admitted exactly
    in accepting states. row: (B, V) int32 next-state table slice,
    acc_state: (B,) bool."""
    import jax.numpy as jnp

    allowed = row >= 0
    allowed = allowed.at[:, eos].set(acc_state)
    return jnp.where(allowed, logits.astype(jnp.float32), -jnp.inf)


def _dfa_advance(row, tok, eos: int, done: int):
    """Next DFA state after emitting `tok`; eos parks the row in the
    `done` sink (which admits only further eos)."""
    import jax.numpy as jnp

    nxt = jnp.take_along_axis(row, tok[:, None], axis=1)[:, 0]
    return jnp.where(tok == eos, done, nxt).astype(jnp.int32)


def _dfa_sig(constraint) -> Optional[Tuple[int, int]]:
    """Program-cache signature: two constraints with the same state count
    and eos id share one compiled program (the tables are data args)."""
    if constraint is None:
        return None
    return (constraint.n_states, constraint.eos_token_id)


DEFAULT_PROMPT_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(
        f"prompt length {n} exceeds the largest prompt bucket "
        f"{buckets[-1]}; pass larger prompt_buckets / max_len")


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


# measured on 1x v5e (BENCH r2): B=768 decode falls off an XLA tiling
# cliff to 33k tok/s vs 78k at B=512 / 80k at B=1024 — non-power-of-two
# large batches must be padded up, the padded run is ~1.8x faster even
# counting the wasted rows. Below this threshold the cliff has no
# measurable effect, and tiny-batch callers (servers with few slots)
# shouldn't pay pad memory.
_POW2_PAD_MIN_BATCH = 64


class TextInferenceInterface:
    """Drives a "unified step graph" model (see recipes.llm.*):
    inputs  input_ids(B,S), pos(), cache_k_i/cache_v_i(B,H,MAX,D), weights
    outputs logits(B,S,V), new_cache_k_i/new_cache_v_i.
    """

    def __init__(self, model: Model, max_len: int,
                 cache_dtype: DType = DType.F32,
                 prompt_buckets: Sequence[int] = DEFAULT_PROMPT_BUCKETS,
                 tokenizer=None, eos_token_id: Optional[int] = None,
                 quantize: Optional[str] = None,
                 weight_dtype: Optional[DType] = None,
                 window_models: Optional[Dict[int, Model]] = None,
                 mesh=None, shard_rules=None,
                 pad_batch_pow2: bool = True,
                 fuse_matmuls: Optional[bool] = None,
                 quantize_precomputed: Optional[Dict[str, Any]] = None):
        """window_models: optional {window_size: step Model} built at
        SMALLER max_len values with the same weights. Decode then runs
        phased over growing cache windows — a step at position p only
        reads a window-p cache, so early steps skip most of the
        HBM-bound KV traffic that bounds large-batch decode (the
        fixed-max_len program reads all max_len slots every step).

        mesh + shard_rules: multi-chip SERVING — weights are placed with
        megatron-style per-name PartitionSpecs (parallel.mesh rules), KV
        caches shard heads over `tp` and batch over `dp`, and GSPMD
        propagates the shardings through the jitted prefill/decode
        programs (collectives ride ICI)."""
        self.model = model
        self.mesh = mesh
        self.shard_rules = shard_rules
        self.max_len = max_len
        self.pad_batch_pow2 = pad_batch_pow2
        self.cache_dtype = cache_dtype
        # KV-cache storage dtype is independent of the packed-weight
        # dequantization target: a sub-byte cache (f8) must never drag
        # the weights down to unscaled fp8.
        if weight_dtype is None:
            weight_dtype = (cache_dtype if cache_dtype in
                            (DType.F32, DType.F16, DType.BF16)
                            else DType.BF16)
        self.weight_dtype = weight_dtype
        self.prompt_buckets = [b for b in prompt_buckets if b <= max_len]
        if not self.prompt_buckets:
            raise ValueError(
                f"no prompt bucket <= max_len={max_len} "
                f"(buckets={list(prompt_buckets)})")
        self.tokenizer = tokenizer
        # HF checkpoints may declare several end tokens (Llama-3 ships
        # eos_token_id=[128001,128008,128009]): keep the full set for
        # stop/trim checks and the first as the primary id (DFA
        # constraints and beam search emit a single eos)
        if eos_token_id is None or isinstance(eos_token_id, int):
            self.eos_token_id = eos_token_id
            self.eos_token_ids = (None if eos_token_id is None
                                  else (eos_token_id,))
        else:
            ids = tuple(int(e) for e in eos_token_id)
            self.eos_token_id = ids[0] if ids else None
            self.eos_token_ids = ids or None
        milli, weight_inputs = model.graph.to_milli()
        self.milli = milli
        self._quantized = {}
        self._packed = {}
        # fuse same-input projections (q/k/v, gate/up) into one wide
        # matmul + Split — numerically exact, and the decode path is
        # bound by matmul COUNT, not weight bytes (fixed ~260 us per
        # chained decode matmul measured in scripts/latency_probe.py).
        # Auto-on single-chip; off under a mesh (megatron shard rules
        # match per-projection weight names).
        self._fused: Dict[str, List[Tuple[str, int]]] = {}
        if fuse_matmuls is None:
            fuse_matmuls = mesh is None
        if fuse_matmuls:
            from ..milli.transforms import fuse_parallel_matmuls

            self._fused = fuse_parallel_matmuls(milli, set(weight_inputs))
        live_weights = [n for n in milli.inputs
                        if n in weight_inputs or n in self._fused]
        if quantize == "int8":
            from ..milli.transforms import quantize_matmul_weights

            # quantize_precomputed: a sibling interface's _quantized
            # dict (same recipe at another max_len) — reuse its int8
            # arrays/device buffers instead of re-quantizing and
            # re-uploading the whole weight set (an 8B re-build costs
            # ~19 min mostly in host gen + tunnel upload)
            self._quantized = quantize_matmul_weights(
                milli, live_weights,
                lambda n: self._dense_np(n, DType.F32),
                precomputed=quantize_precomputed)
        elif quantize == "packed" or (
                quantize is None
                and getattr(model.graph.store, "packed_sources", None)):
            # GGUF sub-byte weights stay packed in HBM and dequantize
            # in-register via the fused Pallas kernel (reference
            # QuantMatMul path, src/packed_tensor.rs:96). Auto-enabled
            # when the loader recorded packed sources.
            from ..milli.transforms import pack_matmul_nodes

            self._pack_sources = self._packed_sources_with_fused(
                dict(getattr(model.graph.store, "packed_sources", None)
                     or {}))
            self._packed = pack_matmul_nodes(milli, live_weights,
                                             model.graph.store,
                                             sources=self._pack_sources)
        elif quantize in ("q4_0", "q8_0", "q5_0", "q4_k", "q6_k"):
            # host-quantize ANY dense checkpoint into GGUF blocks and
            # execute through the same fused packed kernel — sub-byte
            # weight HBM without needing a GGUF file. Ineligible
            # weights (non-2-D, K not a block multiple) stay dense.
            from ..backends.cpu.dequant import quantize_blocks
            from ..milli.transforms import pack_matmul_nodes
            from ..packed_format import PackedFormat
            from ..tensor import PackedTensor

            fmt = PackedFormat[quantize.upper()]
            store = model.graph.store
            _q_memo: Dict[str, Any] = {}

            def _q_source(n):
                def make():
                    if n not in _q_memo:   # window graphs reuse the
                        w = self._dense_np(n, DType.F32)
                        if w.ndim != 2 or w.shape[0] % max(
                                64, fmt.block_size):
                            _q_memo[n] = None
                        else:
                            _q_memo[n] = PackedTensor(
                                quantize_blocks(
                                    np.ascontiguousarray(w.T), fmt),
                                fmt, (w.shape[1], w.shape[0]))  # (N, K)
                    return _q_memo[n]
                return make

            self._pack_sources = {n: _q_source(n) for n in live_weights}
            self._packed = pack_matmul_nodes(
                milli, live_weights, store,
                sources=self._pack_sources)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.weight_names = [n for n in milli.inputs
                             if n in weight_inputs or n in self._fused
                             or n.endswith("::scale")
                             or n.endswith("::pscales")
                             or n.endswith("::poffsets")]
        self.input_names = list(milli.inputs)
        self.output_names = list(milli.outputs)
        self.cache_in_names = [n for n in self.input_names if n.startswith("cache_")]
        self.cache_out_names = [n for n in self.output_names if n.startswith("new_cache_")]
        self._weights_dev: Optional[List[Any]] = None
        # multi-LoRA serving (install_adapters): per-row extra inputs
        # threaded through the weights list tail
        self.row_extra_names: List[str] = []
        self._lora_stacks: Dict[str, np.ndarray] = {}
        self._milli_base = None          # pre-surgery graph (install_adapters)
        self.adapter_slots: Dict[Optional[str], int] = {None: 0}
        self._programs: Dict[Tuple, Any] = {}
        self._dfa_device: Dict[Tuple, Any] = {}
        self._dfa_cache: Dict[Tuple, Any] = {}
        # infer cache geometry from declared input info
        info = model.graph.tensors[model.graph.by_name[self.cache_in_names[0]]].info
        dims = info.dims()
        self.n_heads = int(dims[1].value())
        self.head_dim = int(dims[3].value())
        # windowed decode: per-window millis (weight names must match)
        self.window_models = dict(window_models or {})
        self._window_millis: Dict[int, Any] = {}
        for w, wm in self.window_models.items():
            wmilli, w_weights = wm.graph.to_milli()
            if self._fused:
                from ..milli.transforms import fuse_parallel_matmuls

                # identical recipe -> identical deterministic fusion,
                # so window graphs share the fused weight inputs
                fuse_parallel_matmuls(wmilli, set(w_weights))
            w_live = [n for n in wmilli.inputs
                      if n in w_weights or n in self._fused]
            if self._quantized:
                from ..milli.transforms import quantize_matmul_weights

                # same surgery, same int8 arrays (precomputed=) — the
                # window graphs share the main graph's upload set
                quantize_matmul_weights(wmilli, w_live, None,
                                        precomputed=self._quantized)
            if self._packed:
                from ..milli.transforms import pack_matmul_nodes

                # same sources (GGUF store entries, or the host-
                # quantize callables) as the main milli, so window
                # graphs get identical ::pscales/::poffsets inputs
                pack_matmul_nodes(wmilli, w_live,
                                  model.graph.store,
                                  sources=getattr(self, "_pack_sources",
                                                  None))
            wnames = [n for n in wmilli.inputs
                      if n in w_weights or n in self._fused
                      or n.endswith("::scale")
                      or n.endswith("::pscales")
                      or n.endswith("::poffsets")]
            if wnames != self.weight_names:
                raise ValueError(
                    f"window {w} model weight inputs differ from the "
                    f"main model's — build all windows from one recipe")
            self._window_millis[w] = wmilli

    # ------------------------------------------------------------------
    def _dense_np(self, n: str, dtype: Optional[DType] = None) -> np.ndarray:
        """Dense numpy weight by milli input name; fused inputs
        concatenate their members column-wise (exactness argument in
        milli.transforms.fuse_parallel_matmuls)."""
        store = self.model.graph.store
        dt = dtype or self.weight_dtype
        if n in self._fused:
            return np.concatenate(
                [store.get_numeric(m, dt).numpy()
                 for m, _ in self._fused[n]], axis=1)
        return store.get_numeric(n, dt).numpy()

    def _packed_sources_with_fused(self, sources: Dict[str, Any]) -> Dict[str, Any]:
        """Extend GGUF packed sources with fused entries: PackedTensor
        rows are output channels, so a fused (N1+N2, K) tensor is the
        raw byte concatenation of its members."""
        from ..tensor import PackedTensor

        for fname, members in self._fused.items():
            if not all(m in sources for m, _ in members):
                continue

            def make(members=members):
                pts = [sources[m]() for m, _ in members]
                if any(p is None for p in pts):
                    return None
                if all(isinstance(p, dict) for p in pts):
                    # GPTQ/AWQ importers emit device-layout dicts:
                    # q (K/2|K, N), scales/offsets (Kg, N) — exact
                    # column-wise concat
                    if (len({int(p["bits"]) for p in pts}) != 1
                            or len({p["q"].shape[0] for p in pts}) != 1
                            or len({p["scales"].shape[0]
                                    for p in pts}) != 1):
                        return None
                    return {
                        "q": np.concatenate([p["q"] for p in pts], axis=1),
                        "scales": np.concatenate(
                            [p["scales"] for p in pts], axis=1),
                        "offsets": np.concatenate(
                            [p["offsets"] for p in pts], axis=1),
                        "bits": pts[0]["bits"]}
                if not all(isinstance(p, PackedTensor) for p in pts):
                    return None
                fmts = {p.fmt for p in pts}
                if len(fmts) != 1 or any(len(p.shape) != 2 for p in pts):
                    return None
                K = pts[0].shape[1]
                if any(p.shape[1] != K for p in pts):
                    return None
                data = np.concatenate(
                    [np.frombuffer(p.data, dtype=np.uint8) for p in pts])
                return PackedTensor(data.tobytes(), pts[0].fmt,
                                    (sum(p.shape[0] for p in pts), K))

            sources[fname] = make
        return sources

    def install_adapters(self, adapters: "Dict[str, Dict[str, Tuple]]"):
        """Multi-LoRA serving: install named adapters for per-row
        selection. adapters maps adapter name -> {milli weight input:
        (A (K,r), B (r,N), scale)}. After this, every compiled program
        takes an extra per-row i64 `lora_idx` at the tail of the
        weights list (slot 0 = base; `adapter_slots` maps names to
        slots); callers that don't pass it run the base model. Must be
        called before any program compiles."""
        from ..milli.transforms import inject_multi_lora

        if self._programs or self._weights_dev is not None:
            raise ValueError("install_adapters before any program "
                             "compiles (fresh interface)")
        if self._window_millis:
            raise ValueError("adapters + windowed decode not supported")
        if self.row_extra_names:
            raise ValueError("adapters already installed")
        if self._fused:
            if self._quantized or self._packed:
                raise ValueError(
                    "adapters on a quantized graph with fused matmuls "
                    "not supported; build with fuse_matmuls=False")
            # transparently de-fuse: adapters target per-projection
            # weight inputs, and nothing has compiled yet
            milli, weight_inputs = self.model.graph.to_milli()
            self.milli = milli
            self._fused = {}
            self.weight_names = [n for n in milli.inputs
                                 if n in weight_inputs]
            self.input_names = list(milli.inputs)
            self.output_names = list(milli.outputs)
        names = list(adapters)
        targeted = {w for a in adapters.values() for w in a}
        missing = sorted(w for w in targeted if w not in self.milli.inputs)
        if missing:
            raise ValueError(
                f"adapter targets are not runtime weight inputs of this "
                f"graph: {missing} (small weights are baked as "
                f"constants; available: {self.weight_names[:8]}...)")
        quantized = sorted(targeted & (set(self._quantized)
                                       | set(self._packed)))
        if quantized:
            raise ValueError(
                f"adapters on quantized weights not supported: {quantized}")
        store = self.model.graph.store

        def getter(n):
            return store.get_numeric(n, self.weight_dtype).numpy()

        # keep the pre-surgery graph: programs whose live rows are ALL
        # base (slot 0) trace against it and skip the bypass einsums
        # entirely (the masked-einsum form still costs ~4.6% decode
        # when every row is base)
        import copy

        self._milli_base = copy.deepcopy(self.milli)
        self._lora_stacks = inject_multi_lora(
            self.milli, [adapters[n] for n in names], getter)
        self.adapter_slots = {None: 0,
                              **{n: i + 1 for i, n in enumerate(names)}}
        self.weight_names = self.weight_names + sorted(self._lora_stacks)
        self.row_extra_names = ["lora_idx"]

    def weights_with_rows(self, row_extras: "Sequence[Any]") -> List[Any]:
        """The weights list with per-row extra inputs (lora_idx)
        appended — what compiled programs expect after
        install_adapters."""
        return self._weights() + list(row_extras)

    def _weights(self) -> List[Any]:
        if self._weights_dev is None:
            import jax

            shardings = None
            if self.mesh is not None:
                from ..parallel.mesh import weight_shardings

                shardings = weight_shardings(self.weight_names, self.mesh,
                                             self.shard_rules or [])
            out = []
            for i, n in enumerate(self.weight_names):
                dev = shardings[i] if shardings is not None else None
                if n in self._lora_stacks and self.mesh is not None:
                    # adapter stacks are (n+1, K, r)-shaped — a base
                    # weight's 2-D partition rule must not catch them
                    # by name prefix; they replicate (they're tiny)
                    from jax.sharding import NamedSharding, PartitionSpec

                    dev = NamedSharding(self.mesh, PartitionSpec())
                if n.endswith("::scale"):
                    arr = self._quantized[n[:-7]][1]
                elif n in self._quantized:
                    arr = self._quantized[n][0]
                elif n.endswith("::pscales"):
                    arr = self._packed[n[:-9]]["scales"]
                elif n.endswith("::poffsets"):
                    arr = self._packed[n[:-10]]["offsets"]
                elif n in self._packed:
                    arr = self._packed[n]["q"]
                elif n in self._lora_stacks:
                    arr = self._lora_stacks[n]
                else:
                    arr = self._dense_np(n)
                out.append(jax.device_put(arr, dev) if dev is not None
                           else jax.device_put(arr))
            self._weights_dev = out
            # write the uploaded int8 buffers back into _quantized so a
            # sibling interface built with quantize_precomputed= this
            # dict reuses the DEVICE arrays (device_put on a committed
            # array is a no-op) — without this the 8.5 GB int8 set would
            # ride the tunnel once per interface
            for i, n in enumerate(self.weight_names):
                if n.endswith("::scale") and n[:-7] in self._quantized:
                    base = n[:-7]
                    w = self._quantized[base]
                    self._quantized[base] = (w[0], out[i])
                elif n in self._quantized:
                    self._quantized[n] = (out[i], self._quantized[n][1])
        return self._weights_dev

    def _cache_sharding(self, n_heads_this: int):
        """KV caches: batch over dp, heads over tp (replicated when the
        head count doesn't divide the tp extent)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        tp_ok = (self.mesh.shape.get("tp", 1) > 1
                 and n_heads_this % self.mesh.shape["tp"] == 0)
        dp_ok = self.mesh.shape.get("dp", 1) > 1
        return NamedSharding(self.mesh, P("dp" if dp_ok else None,
                                          "tp" if tp_ok else None))

    def _vocab_size(self) -> int:
        info = self.model.graph.tensors[
            self.model.graph.by_name["logits"]].info
        return int(info.dims()[-1].value())

    def window_cache_dims(self, batch: int, window: int):
        """Declared cache shapes of the `window`-sized step graph
        (length axis = window instead of max_len). The batcher's
        admission uses these so a k-row admission allocates k x window
        KV temporaries instead of k x max_len — at 8B serving scale
        the full-length temporaries alone exceed HBM (measured: N=256,
        max_len=192 admission OOMs at 6.4 GB big cache + 6.4 GB fresh
        + 8.5 GB weights)."""
        milli = self._window_millis[window]
        out = []
        for n in self.cache_in_names:
            info = milli.tensors[milli.inputs[n]].info
            out.append(tuple(batch if not d.is_known else int(d.value())
                             for d in info.dims()))
        return out

    def fresh_cache(self, batch: int):
        import jax
        import jax.numpy as jnp

        out = []
        for n in self.cache_in_names:
            # per-cache declared shapes (heterogeneous for MLA: compressed
            # latent + rope-key caches have different widths)
            info = self.model.graph.tensors[self.model.graph.by_name[n]].info
            dims = tuple(batch if not d.is_known else int(d.value())
                         for d in info.dims())
            buf = jnp.zeros(dims, dtype=self.cache_dtype.to_jax())
            if self.mesh is not None:
                buf = jax.device_put(buf, self._cache_sharding(dims[1]))
            out.append(buf)
        return out

    def _traced_step(self, batch: int, seq: int,
                     window: Optional[int] = None,
                     adapters: bool = True):
        """Traceable fn(ids, pos, *caches, *weights) -> (logits, *caches).
        window selects a smaller-max_len step graph (windowed decode);
        adapters=False selects the pre-surgery graph (no LoRA bypass —
        for program variants whose live rows are all base)."""
        from ..backends.xla.compiler import _trace_graph, ensure_x64

        ensure_x64()
        milli = (self._window_millis[window] if window is not None
                 and window in self._window_millis else self.milli)
        if not adapters and getattr(self, "_milli_base", None) is not None:
            milli = self._milli_base
        fn = _trace_graph(milli, {})

        order = list(milli.inputs)
        cache_ins = [n for n in order if n.startswith("cache_")]
        out_names = list(milli.outputs)
        cache_outs = [n for n in out_names if n.startswith("new_cache_")]
        # a pos_per_row step graph (built for the ContinuousBatcher)
        # takes pos as (B,); broadcast the interface's scalar pos so the
        # direct paths (constrained / with_probs / beam) work on the
        # same ragged model the batcher serves
        pos_tid = milli.inputs.get("pos")
        pos_info = (milli.tensors[pos_tid].info
                    if pos_tid is not None else None)
        pos_per_row = pos_info is not None and pos_info.rank == 1

        def step(ids, pos, caches, weights):
            import jax.numpy as _jnp

            if pos_per_row:
                pos = _jnp.broadcast_to(_jnp.asarray(pos, _jnp.int64),
                                        (ids.shape[0],))
            by_name = {"input_ids": ids, "pos": pos}
            by_name.update(dict(zip(cache_ins, caches)))
            # row extras (lora_idx) ride at the tail of the weights
            # list; callers that pass plain _weights() get the base
            # model (all-zeros slot 0)
            by_name.update(dict(zip(self.weight_names
                                    + self.row_extra_names, weights)))
            for n in self.row_extra_names:
                if n not in by_name:
                    by_name[n] = _jnp.zeros((ids.shape[0],), _jnp.int64)
            args = [by_name[n] for n in order]
            outs = fn(*args)
            named = dict(zip(out_names, outs))
            new_caches = [named[n] for n in cache_outs]
            return named["logits"], new_caches

        return step

    def _program(self, batch: int, prompt_bucket: int, n_new: int,
                 sampling: Optional[SamplingParams] = None,
                 constraint=None, use_bias: bool = False):
        import jax
        import jax.numpy as jnp

        key = (batch, prompt_bucket, n_new, sampling, _dfa_sig(constraint),
               use_bias)
        if key in self._programs:
            return self._programs[key]
        step = self._traced_step(batch, prompt_bucket)
        sp = sampling
        use_dfa = constraint is not None
        eos = constraint.eos_token_id if use_dfa else 0
        done = constraint.done if use_dfa else 0

        def full(ids_padded, prompt_len, caches, weights, rng_key,
                 dfa_trans, dfa_acc, bias):
            # prefill at bucket length
            logits, caches = step(ids_padded, jnp.asarray(0, dtype=jnp.int64),
                                  caches, weights)
            last = logits[:, prompt_len - 1, :]
            if use_bias:   # OpenAI logit_bias: a (V,) additive vector
                last = last + bias
            B, V = last.shape
            seen = None
            if _uses_seen(sp):
                # prompt tokens count as seen (only the real prefix)
                valid = jnp.arange(ids_padded.shape[1])[None] < prompt_len
                seen = jnp.zeros((B, V), jnp.int32).at[
                    jnp.arange(B)[:, None], ids_padded].add(
                    jnp.broadcast_to(valid, ids_padded.shape)
                    .astype(jnp.int32))
            dstate = jnp.zeros((B,), jnp.int32) if use_dfa else None
            if use_dfa:
                row = dfa_trans[dstate]
                last = _dfa_mask(last, row, dfa_acc[dstate], eos)
            first_tok = _pick_token(last, jax.random.fold_in(rng_key, 0), sp,
                                    seen)
            if seen is not None:
                seen = seen.at[jnp.arange(B), first_tok].add(1)
            if use_dfa:
                dstate = _dfa_advance(row, first_tok, eos, done)

            def body(carry, i):
                cur, pos, caches, seen, dstate = carry
                lg, caches = step(cur[:, None], pos, caches, weights)
                last = lg[:, -1, :]
                if use_bias:
                    last = last + bias
                if use_dfa:
                    row = dfa_trans[dstate]
                    last = _dfa_mask(last, row, dfa_acc[dstate], eos)
                nxt = _pick_token(last,
                                  jax.random.fold_in(rng_key, i + 1), sp,
                                  seen)
                if seen is not None:
                    seen = seen.at[jnp.arange(seen.shape[0]), nxt].add(1)
                if use_dfa:
                    dstate = _dfa_advance(row, nxt, eos, done)
                return (nxt, pos + 1, caches, seen, dstate), cur

            (final_tok, _, caches, _, _), toks = jax.lax.scan(
                body, (first_tok, prompt_len.astype(jnp.int64), caches, seen,
                       dstate),
                jnp.arange(n_new))
            # toks: (n_new, B) of emitted tokens (first is first_tok)
            return jnp.swapaxes(toks, 0, 1), caches

        # donate cache buffers (arg 2)
        jitted = jax.jit(full, donate_argnums=(2,), static_argnums=())
        self._programs[key] = jitted
        return jitted

    def _decode_program(self, batch: int, n_new: int,
                        sampling: Optional[SamplingParams] = None,
                        constraint=None):
        """Decode-only program: continue from existing caches (the
        multimodal inputs_embeds prefill hands off here)."""
        import jax
        import jax.numpy as jnp

        key = ("decode", batch, n_new, sampling, _dfa_sig(constraint))
        if key in self._programs:
            return self._programs[key]
        step = self._traced_step(batch, 1)
        sp = sampling
        use_dfa = constraint is not None
        eos = constraint.eos_token_id if use_dfa else 0
        done = constraint.done if use_dfa else 0

        vocab = self._vocab_size()

        def dec(first_tok, pos, caches, weights, rng_key,
                dfa_trans, dfa_acc):
            seen = None
            if _uses_seen(sp):
                # no prompt visibility here (embeds prefill hand-off):
                # the count array starts from the first token
                seen = jnp.zeros((batch, vocab), jnp.int32).at[
                    jnp.arange(batch), first_tok].add(1)
            # the hand-off's first token was sampled unconstrained; the
            # constraint governs every token this program emits
            dstate = (jnp.zeros((batch,), jnp.int32) if use_dfa else None)

            def body(carry, i):
                cur, p, caches, seen, dstate = carry
                lg, caches = step(cur[:, None], p, caches, weights)
                last = lg[:, -1, :]
                if use_dfa:
                    row = dfa_trans[dstate]
                    last = _dfa_mask(last, row, dfa_acc[dstate], eos)
                nxt = _pick_token(last,
                                  jax.random.fold_in(rng_key, i + 1), sp,
                                  seen)
                if seen is not None:
                    seen = seen.at[jnp.arange(seen.shape[0]), nxt].add(1)
                if use_dfa:
                    dstate = _dfa_advance(row, nxt, eos, done)
                return (nxt, p + 1, caches, seen, dstate), cur

            (_, _, caches, _, _), toks = jax.lax.scan(
                body, (first_tok, pos.astype(jnp.int64), caches, seen,
                       dstate),
                jnp.arange(n_new))
            return jnp.swapaxes(toks, 0, 1), caches

        jitted = jax.jit(dec, donate_argnums=(2,))
        self._programs[key] = jitted
        return jitted

    def _beam_program(self, batch: int, beam: int, bucket: int, n_new: int,
                      length_penalty: float, eos: int):
        """Causal-LM beam search as ONE program: prefill at B rows,
        tile caches to B*W, then the beam scan (top-k over (B, W*V),
        caches gathered by parent beam each step)."""
        import jax
        import jax.numpy as jnp

        key = ("beam", batch, beam, bucket, n_new, length_penalty, eos)
        if key in self._programs:
            return self._programs[key]
        step_p = self._traced_step(batch, bucket)
        step_d = self._traced_step(batch * beam, 1)
        B, W = batch, beam
        R = B * W

        def run(ids_padded, prompt_len, caches, weights):
            logits, caches = step_p(ids_padded,
                                    jnp.asarray(0, dtype=jnp.int64),
                                    caches, weights)
            last = jax.nn.log_softmax(
                logits[:, prompt_len - 1, :].astype(jnp.float32), axis=-1)
            V = last.shape[-1]
            top_s, top_i = jax.lax.top_k(last, W)          # (B, W)
            cur = top_i.reshape(-1).astype(jnp.int64)
            scores = top_s.reshape(-1)
            caches = [jnp.repeat(c, W, axis=0) for c in caches]
            alive = cur != eos
            hist = jnp.zeros((R, n_new), dtype=jnp.int64).at[:, 0].set(cur)

            def body(carry, i):
                cur, pos, scores, alive, hist, caches = carry
                lg, caches = step_d(cur[:, None], pos, caches, weights)
                lp = jax.nn.log_softmax(
                    lg[:, -1, :].astype(jnp.float32), axis=-1)
                eos_only = jnp.full((V,), -jnp.inf).at[eos].set(0.0)
                lp = jnp.where(alive[:, None], lp, eos_only[None])
                total = scores[:, None] + lp
                flat = total.reshape(B, W * V)
                top_s, top_i = jax.lax.top_k(flat, W)
                parent = top_i // V
                token = (top_i % V).astype(jnp.int64)
                rows = (jnp.arange(B)[:, None] * W + parent).reshape(-1)
                caches = [c[rows] for c in caches]
                hist = hist[rows].at[:, i].set(token.reshape(-1))
                cur = token.reshape(-1)
                scores = top_s.reshape(-1)
                alive = alive[rows] & (cur != eos)
                return (cur, pos + 1, scores, alive, hist, caches), None

            (cur, _, scores, alive, hist, caches), _ = jax.lax.scan(
                body, (cur, prompt_len.astype(jnp.int64), scores, alive,
                       hist, caches), jnp.arange(1, n_new))
            if length_penalty != 0.0:
                lengths = jnp.minimum(
                    jnp.argmax(hist == eos, axis=1)
                    + jnp.where((hist == eos).any(axis=1), 1, n_new), n_new)
                norm = scores.reshape(B, W) / (
                    lengths.reshape(B, W).astype(jnp.float32)
                    ** length_penalty)
            else:
                norm = scores.reshape(B, W)
            best = jnp.argmax(norm, axis=1)
            return hist.reshape(B, W, n_new)[jnp.arange(B), best]

        self._programs[key] = jax.jit(run, donate_argnums=(2,))
        return self._programs[key]

    def beam_search_tokens(self, prompt_ids: np.ndarray, n_new: int,
                           beam: int = 4, length_penalty: float = 0.0,
                           eos_token_id: Optional[int] = None) -> np.ndarray:
        """(B, L) prompt -> (B, n_new) best beam sequences."""
        import jax.numpy as jnp

        prompt_ids = np.asarray(prompt_ids, dtype=np.int64)
        if prompt_ids.ndim == 1:
            prompt_ids = prompt_ids[None]
        B, L = prompt_ids.shape
        Sb = _bucket(L, self.prompt_buckets)
        padded = np.zeros((B, Sb), dtype=np.int64)
        padded[:, :L] = prompt_ids
        eos = (eos_token_id if eos_token_id is not None
               else (self.eos_token_id if self.eos_token_id is not None
                     else -1))
        prog = self._beam_program(B, beam, Sb, n_new, length_penalty, eos)
        toks = prog(jnp.asarray(padded), jnp.asarray(L, dtype=jnp.int64),
                    self.fresh_cache(B), self._weights())
        return np.asarray(toks)

    def _dfa_tables(self, constraint):
        """(dfa_trans, dfa_acc) device arrays for a TokenDFA, uploaded
        once per (pattern, shape) and reused across calls; (None, None)
        when unconstrained."""
        if constraint is None:
            return None, None
        import jax.numpy as jnp

        key = (constraint.pattern, constraint.trans.shape,
               constraint.eos_token_id)
        hit = self._dfa_device.get(key)
        if hit is None:
            V = self._vocab_size()
            trans = constraint.trans
            if trans.shape[1] != V:
                raise ValueError(
                    f"constraint vocab width {trans.shape[1]} != model "
                    f"vocab {V}; pass vocab_size={V} to compile_token_dfa")
            hit = (jnp.asarray(trans),
                   jnp.asarray(constraint.accepting))
            self._dfa_device[key] = hit
        return hit

    def decode_tokens(self, first_tok: np.ndarray, pos: int, caches,
                      n_new: int,
                      sampling: Optional[SamplingParams] = None,
                      constraint=None) -> np.ndarray:
        """Continue generation from caches: emits n_new tokens starting
        with first_tok (which is included in the output)."""
        import jax
        import jax.numpy as jnp

        first_tok = np.asarray(first_tok, dtype=np.int64).reshape(-1)
        prog = self._decode_program(first_tok.shape[0], n_new, sampling,
                                    constraint)
        rng = jax.random.PRNGKey(sampling.seed if sampling else 0)
        dt, da = self._dfa_tables(constraint)
        toks, _ = prog(jnp.asarray(first_tok),
                       jnp.asarray(pos, dtype=jnp.int64), caches,
                       self._weights(), rng, dt, da)
        return np.asarray(toks)

    # ------------------------------------------------------------------
    # windowed decode: growing cache windows, fused into one program
    # ------------------------------------------------------------------
    def _unified_windowed_program(self, batch, bucket, prompt_len, n_new,
                                  phases, sampling, constraint=None):
        """ONE jitted program running every window phase: prefill at
        `bucket` inside the first window, then for each later phase the
        caches are zero-padded to the next window size *inside the
        trace* and decode continues with that window's step graph.

        vs the earlier one-dispatch-per-phase design this removes the
        inter-phase host round-trips (~55 ms each on the axon tunnel),
        which is what made fine-grained window schedules a net loss —
        fused, a 32-slot-step schedule keeps the full HBM-traffic win.
        The rng stream (fold_in(rng, global_step)) is identical to the
        flat program's, so outputs stay exactly equal."""
        import jax
        import jax.numpy as jnp

        key = ("uwin", batch, bucket, prompt_len, n_new, tuple(phases),
               sampling, _dfa_sig(constraint))
        if key in self._programs:
            return self._programs[key]
        sp = sampling
        use_dfa = constraint is not None
        eos = constraint.eos_token_id if use_dfa else 0
        done = constraint.done if use_dfa else 0
        prefill = self._traced_step(batch, bucket, window=phases[0][1])
        dsteps = {w: self._traced_step(batch, 1, window=w)
                  for _, w in phases}

        def run(ids_padded, weights, rng_key, dfa_trans, dfa_acc):
            k0, w0 = phases[0]
            caches = self._fresh_cache_w_traced(batch, w0)
            logits, caches = prefill(ids_padded,
                                     jnp.asarray(0, dtype=jnp.int64),
                                     caches, weights)
            last = logits[:, prompt_len - 1, :]
            B, V = last.shape
            seen = None
            if _uses_seen(sp):
                valid = jnp.arange(ids_padded.shape[1])[None] < prompt_len
                seen = jnp.zeros((B, V), jnp.int32).at[
                    jnp.arange(B)[:, None], ids_padded].add(
                    jnp.broadcast_to(valid, ids_padded.shape)
                    .astype(jnp.int32))
            dstate = jnp.zeros((B,), jnp.int32) if use_dfa else None
            if use_dfa:
                row = dfa_trans[dstate]
                last = _dfa_mask(last, row, dfa_acc[dstate], eos)
            cur = _pick_token(last, jax.random.fold_in(rng_key, 0), sp, seen)
            if seen is not None:
                seen = seen.at[jnp.arange(B), cur].add(1)
            if use_dfa:
                dstate = _dfa_advance(row, cur, eos, done)

            pos = jnp.asarray(prompt_len, dtype=jnp.int64)
            off = 0
            prev_w = w0
            toks_out = []
            for k, w in phases:
                if w != prev_w:
                    caches = [jnp.pad(
                        c, [(0, 0), (0, 0), (0, w - prev_w), (0, 0)])
                        for c in caches]
                    prev_w = w
                step = dsteps[w]

                def body(carry, i, step=step):
                    cur, pos, caches, seen, dstate = carry
                    lg, caches = step(cur[:, None], pos, caches, weights)
                    last = lg[:, -1, :]
                    if use_dfa:
                        row = dfa_trans[dstate]
                        last = _dfa_mask(last, row, dfa_acc[dstate], eos)
                    nxt = _pick_token(last,
                                      jax.random.fold_in(rng_key, i + 1), sp,
                                      seen)
                    if seen is not None:
                        seen = seen.at[jnp.arange(seen.shape[0]),
                                       nxt].add(1)
                    if use_dfa:
                        dstate = _dfa_advance(row, nxt, eos, done)
                    return (nxt, pos + 1, caches, seen, dstate), cur

                (cur, pos, caches, seen, dstate), toks = jax.lax.scan(
                    body, (cur, pos, caches, seen, dstate),
                    jnp.arange(off, off + k))
                toks_out.append(jnp.swapaxes(toks, 0, 1))
                off += k
            return jnp.concatenate(toks_out, axis=1)

        self._programs[key] = jax.jit(run)
        return self._programs[key]

    def _fresh_cache_w_traced(self, batch: int, window: int):
        import jax.numpy as jnp

        out = []
        for n in self.cache_in_names:
            info = self.model.graph.tensors[self.model.graph.by_name[n]].info
            dims = [batch if not d.is_known else int(d.value())
                    for d in info.dims()]
            dims[2] = window
            out.append(jnp.zeros(tuple(dims), dtype=self.cache_dtype.to_jax()))
        return out

    def _generate_windowed(self, prompt_ids: np.ndarray, n_new: int,
                           sampling: Optional[SamplingParams],
                           constraint=None) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        B, L = prompt_ids.shape
        Sb = _bucket(L, self.prompt_buckets)
        windows = sorted(w for w in self._window_millis if w > max(Sb, L))
        windows.append(self.max_len)
        padded = np.zeros((B, Sb), dtype=np.int64)
        padded[:, :L] = prompt_ids
        weights = self._weights()
        rng = jax.random.PRNGKey(sampling.seed if sampling else 0)

        # static phase schedule (k decode steps inside window w)
        phases = []
        pos, remaining = L, n_new
        for w in windows:
            if remaining <= 0:
                break
            k = min(remaining, w - pos)
            if k <= 0:
                continue
            phases.append((k, w))
            pos += k
            remaining -= k
        prog = self._unified_windowed_program(B, Sb, L, n_new,
                                              tuple(phases), sampling,
                                              constraint)
        dt, da = self._dfa_tables(constraint)
        return np.asarray(prog(jnp.asarray(padded), weights, rng, dt, da))

    # ------------------------------------------------------------------
    def generate_tokens(self, prompt_ids: np.ndarray, n_new: int,
                        caches=None,
                        sampling: Optional[SamplingParams] = None,
                        constraint=None,
                        logit_bias: Optional[np.ndarray] = None
                        ) -> np.ndarray:
        """prompt_ids: (B, L) int64, same L per row. Returns (B, n_new).
        sampling=None -> greedy; else temperature/top-k/top-p categorical
        draws inside the compiled scan (seeded, reproducible).
        constraint: a constrained.TokenDFA — every emitted token is
        masked so the output text matches the compiled regex/schema.
        logit_bias: (V,) f32 added to every step's logits before
        sampling (OpenAI logit_bias; a program ARGUMENT, so different
        bias maps share one compiled program)."""
        import jax
        import jax.numpy as jnp

        prompt_ids = np.asarray(prompt_ids, dtype=np.int64)
        if prompt_ids.ndim == 1:
            prompt_ids = prompt_ids[None]
        B, L = prompt_ids.shape
        # guard the measured non-power-of-two batch tiling cliff (B=768
        # decodes 2.4x slower than B=1024 on v5e): pad the batch up to
        # the next power of two and slice the pad rows back off. Greedy
        # outputs for the real rows are unchanged; with sampling the rng
        # draws match what a caller using the padded batch would see.
        if (self.pad_batch_pow2 and caches is None
                and B >= _POW2_PAD_MIN_BATCH and B & (B - 1)):
            Bp = _next_pow2(B)
            import warnings

            warnings.warn(
                f"batch {B} is not a power of two (measured TPU tiling "
                f"cliff); padding to {Bp} — pass pad_batch_pow2=False "
                f"to run the raw shape", stacklevel=2)
            padded_rows = np.zeros((Bp, L), dtype=np.int64)
            padded_rows[:B] = prompt_ids
            return self.generate_tokens(padded_rows, n_new,
                                        sampling=sampling,
                                        constraint=constraint,
                                        logit_bias=logit_bias)[:B]
        if self._window_millis and caches is None:
            if logit_bias is not None:
                raise ValueError("logit_bias is not supported with "
                                 "windowed decode")
            return self._generate_windowed(prompt_ids, n_new, sampling,
                                           constraint)
        Sb = _bucket(L, self.prompt_buckets)
        padded = np.zeros((B, Sb), dtype=np.int64)
        padded[:, :L] = prompt_ids
        weights = self._weights()
        if caches is None:
            caches = self.fresh_cache(B)
        use_bias = logit_bias is not None
        prog = self._program(B, Sb, n_new, sampling, constraint, use_bias)
        rng = jax.random.PRNGKey(sampling.seed if sampling else 0)
        ids_dev = jnp.asarray(padded)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp_ok = (self.mesh.shape.get("dp", 1) > 1
                     and B % self.mesh.shape["dp"] == 0)
            ids_dev = jax.device_put(ids_dev, NamedSharding(
                self.mesh, P("dp" if dp_ok else None, None)))
        dt, da = self._dfa_tables(constraint)
        bias = (jnp.asarray(np.asarray(logit_bias, np.float32))
                if use_bias else jnp.zeros((), jnp.float32))
        toks, _ = prog(ids_dev, jnp.asarray(L, dtype=jnp.int64),
                       caches, weights, rng, dt, da, bias)
        return np.asarray(toks)

    def logits(self, prompt_ids: np.ndarray) -> np.ndarray:
        """Single forward: (B, L) -> (B, L, V) logits (prefill program)."""
        import jax
        import jax.numpy as jnp

        prompt_ids = np.asarray(prompt_ids, dtype=np.int64)
        if prompt_ids.ndim == 1:
            prompt_ids = prompt_ids[None]
        B, L = prompt_ids.shape
        Sb = _bucket(L, self.prompt_buckets)
        padded = np.zeros((B, Sb), dtype=np.int64)
        padded[:, :L] = prompt_ids
        # cache the jitted program: a fresh jit(lambda) per call would
        # retrace + recompile EVERY forward (measured 57 s/call on the
        # 124M prefill before this was keyed)
        key = ("logits", B, Sb)
        prog = self._programs.get(key)
        if prog is None:
            step = self._traced_step(B, Sb)
            prog = jax.jit(lambda ids, caches, weights: step(
                ids, jnp.asarray(0, dtype=jnp.int64), caches, weights)[0])
            self._programs[key] = prog
        out = prog(jnp.asarray(padded), self.fresh_cache(B), self._weights())
        return np.asarray(out)[:, :L, :]

    def _hidden_tid(self) -> int:
        """tid of the final hidden state (the lm_head MatMul's
        activation input), found by walking back from the logits output
        through the elementwise tail (bias Add, gemma-style softcap
        Mul/Tanh/Div, Cast/Reshape). Works on every LLM recipe without
        recipe changes — the tap is selected at compile time."""
        milli = self.milli
        producer = {}
        for node in milli.nodes:
            for t in node.outputs:
                producer[t] = node
        # one topological pass: each tensor's depth from the graph
        # inputs. The activation path (through every layer) is always
        # far deeper than any weight/constant/softcap-scalar branch, so
        # "follow the deepest input" survives bias adds, casts, and the
        # gemma2 softcap tail without per-recipe knowledge.
        depth: Dict[int, int] = {}
        for node in milli.nodes:
            d = 1 + max((depth.get(i, 0) for i in node.inputs
                         if i is not None), default=0)
            for t in node.outputs:
                depth[t] = d
        tid = milli.outputs["logits"]
        for _ in range(16):
            node = producer.get(tid)
            if node is None:
                break
            kind = node.op.KIND
            ins = [i for i in node.inputs if i is not None]
            deepest = max(ins, key=lambda i: depth.get(i, 0), default=None)
            if kind in ("MatMul", "Einsum", "Gemm"):
                return deepest
            if kind in ("SimpleBinary", "SimpleUnary", "Cast", "CastLike",
                        "Reshape", "Transpose", "Identity", "Squeeze",
                        "Unsqueeze"):
                if deepest is None:
                    break
                tid = deepest
                continue
            break
        raise ValueError("could not locate the lm_head activation in "
                         "this graph (no hidden-state tap)")

    def hidden_states(self, prompt_ids: np.ndarray) -> np.ndarray:
        """Single forward: (B, L) -> (B, L, E) final hidden states
        (pre-lm_head), via a compile-time capture tap on the prefill
        program. Backs the /v1/embeddings endpoint."""
        import jax
        import jax.numpy as jnp

        from ..backends.xla.compiler import _trace_graph, ensure_x64

        prompt_ids = np.asarray(prompt_ids, dtype=np.int64)
        if prompt_ids.ndim == 1:
            prompt_ids = prompt_ids[None]
        B, L = prompt_ids.shape
        Sb = _bucket(L, self.prompt_buckets)
        padded = np.zeros((B, Sb), dtype=np.int64)
        padded[:, :L] = prompt_ids
        key = ("hidden", B, Sb)
        prog = self._programs.get(key)
        if prog is None:
            ensure_x64()
            milli = self.milli
            fn = _trace_graph(milli, {}, None, [self._hidden_tid()])
            order = list(milli.inputs)
            cache_ins = [n for n in order if n.startswith("cache_")]
            pos_tid = milli.inputs.get("pos")
            pos_info = (milli.tensors[pos_tid].info
                        if pos_tid is not None else None)
            pos_per_row = pos_info is not None and pos_info.rank == 1

            def run(ids, caches, weights):
                pos = (jnp.zeros((ids.shape[0],), jnp.int64) if pos_per_row
                       else jnp.asarray(0, dtype=jnp.int64))
                by_name = {"input_ids": ids, "pos": pos}
                by_name.update(dict(zip(cache_ins, caches)))
                by_name.update(dict(zip(self.weight_names
                                        + self.row_extra_names, weights)))
                for n in self.row_extra_names:
                    if n not in by_name:
                        by_name[n] = jnp.zeros((ids.shape[0],), jnp.int64)
                return fn(*[by_name[n] for n in order])[-1]

            prog = jax.jit(run)
            self._programs[key] = prog
        out = prog(jnp.asarray(padded), self.fresh_cache(B), self._weights())
        return np.asarray(out)[:, :L, :]

    def sequence_scores(self, full_ids: np.ndarray, start, lens
                        ) -> np.ndarray:
        """(B, L) right-padded token rows -> (B,) MEAN log-probability
        of tokens in positions [start_i, lens_i) under teacher forcing.
        One batched prefill; log-softmax, gather, and masked mean all
        run IN-GRAPH, so the (B, L, V) logits never reach the host —
        viable for big vocabularies (best_of reranking)."""
        import jax
        import jax.numpy as jnp

        full_ids = np.asarray(full_ids, np.int64)
        B, L = full_ids.shape
        Sb = _bucket(max(L - 1, 1), self.prompt_buckets)
        padded = np.zeros((B, Sb), np.int64)
        padded[:, :L - 1] = full_ids[:, :-1]
        tgt = np.zeros((B, Sb), np.int64)
        tgt[:, :L - 1] = full_ids[:, 1:]
        key = ("seqscore", B, Sb)
        prog = self._programs.get(key)
        if prog is None:
            step = self._traced_step(B, Sb)

            def run(ids, targets, starts, lengths, caches, weights):
                logits, _ = step(ids, jnp.asarray(0, dtype=jnp.int64),
                                 caches, weights)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                chosen = jnp.take_along_axis(
                    lp, targets[:, :, None], axis=-1)[..., 0]
                pos = jnp.arange(ids.shape[1])[None, :]
                mask = ((pos >= (starts[:, None] - 1))
                        & (pos < (lengths[:, None] - 1)))
                n = jnp.maximum(mask.sum(-1), 1)
                return (chosen * mask).sum(-1) / n

            prog = jax.jit(run)
            self._programs[key] = prog
        out = prog(jnp.asarray(padded), jnp.asarray(tgt),
                   jnp.asarray(np.asarray(start, np.int64)),
                   jnp.asarray(np.asarray(lens, np.int64)),
                   self.fresh_cache(B), self._weights())
        return np.asarray(out)

    def embed(self, ids_list: "Sequence[np.ndarray]",
              pooling: str = "last") -> List[np.ndarray]:
        """Pooled text embeddings: right-pad the token lists into ONE
        batched hidden-states prefill, pool each row over its own
        length (exact under the causal mask), L2-normalize. Shared by
        /v1/embeddings and `cli embed`."""
        if pooling not in ("last", "mean"):
            raise ValueError(f"unknown pooling {pooling!r} (last|mean)")
        ids_list = [np.asarray(a, np.int64).reshape(-1) for a in ids_list]
        if not ids_list or any(a.size == 0 for a in ids_list):
            raise ValueError("inputs must be non-empty token lists")
        L = max(a.size for a in ids_list)
        batch = np.zeros((len(ids_list), L), np.int64)
        for i, a in enumerate(ids_list):
            batch[i, :a.size] = a
        h = self.hidden_states(batch)
        out = []
        for i, a in enumerate(ids_list):
            hv = h[i, :a.size].astype(np.float64)
            v = hv[-1] if pooling == "last" else hv.mean(0)
            out.append(v / (np.linalg.norm(v) + 1e-12))
        return out

    # ------------------------------------------------------------------
    def compile_constraint(self, regex: Optional[str] = None,
                           json_schema=None):
        """Compile a regex or JSON schema into a TokenDFA bound to this
        interface's tokenizer + vocab width (cached per pattern)."""
        from ..constrained import compile_token_dfa, json_schema_to_regex

        if (regex is None) == (json_schema is None):
            raise ValueError("pass exactly one of regex / json_schema")
        if json_schema is not None:
            regex = json_schema_to_regex(json_schema)
        if self.tokenizer is None:
            raise ValueError("constrained decoding needs a tokenizer")
        if self.eos_token_id is None:
            from ..tokenizer import ByteTokenizer

            if isinstance(self.tokenizer, ByteTokenizer):
                self.eos_token_id = ByteTokenizer.EOS
                self.eos_token_ids = (ByteTokenizer.EOS,)
            else:
                raise ValueError(
                    "constrained decoding needs eos_token_id (the DFA "
                    "stops generation by emitting eos once the pattern "
                    "is complete)")
        key = (regex, self.eos_token_id)
        hit = self._dfa_cache.get(key)
        if hit is None:
            hit = compile_token_dfa(regex, self.tokenizer,
                                    self.eos_token_id,
                                    vocab_size=self._vocab_size())
            self._dfa_cache[key] = hit
        return hit

    def run_string_in_string_out(self, text: str, n_new: int = 32,
                                 sampling: Optional[SamplingParams] = None,
                                 regex: Optional[str] = None,
                                 json_schema=None) -> str:
        if self.tokenizer is None:
            raise ValueError("no tokenizer configured")
        constraint = None
        if regex is not None or json_schema is not None:
            constraint = self.compile_constraint(regex, json_schema)
        ids = np.asarray(self.tokenizer.encode(text), dtype=np.int64)[None]
        toks = self.generate_tokens(ids, n_new, sampling=sampling,
                                    constraint=constraint)[0]
        eos_ids = ((constraint.eos_token_id,) if constraint is not None
                   else self.eos_token_ids)
        if eos_ids:
            eos = np.nonzero(np.isin(toks, np.asarray(eos_ids)))[0]
            if eos.size:
                toks = toks[:eos[0]]
        return self.tokenizer.decode([int(t) for t in toks])
