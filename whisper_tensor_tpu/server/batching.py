"""Continuous batching: many concurrent generate requests share one
fixed-shape batched decode program with per-row KV-cache positions.

Reference serving seam: crates/whisper-tensor-server/src/scheduler.rs
:424-717 (job queue + per-request generation). TPU redesign: requests
don't serialize — each occupies a SLOT (row) of a persistent batched KV
cache. Prefill runs per-request at B=1 on a bucketed length, its caches
are spliced into the slot, and all active rows then advance together
through a jitted `chunk`-step lax.scan (per-row positions via the
pos_per_row step graph; the chunk amortizes dispatch latency). Rows
park at a reserved scratch position when idle, so the program shape
never changes and XLA keeps one executable.

The scheduler loop is PIPELINED: row state (cur/pos/active) lives on
the device between chunks, host-side slot updates (admissions, parks)
ride into the NEXT chunk dispatch as in-graph scatters, and the host
fetches chunk k's tokens only after dispatching chunk k+1 — so the
device->host sync (~0.1-0.3 s through a remote-dispatch tunnel)
overlaps the next chunk's execution instead of serializing the loop.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..dtype import DType
from ..interfaces.text import (SamplingParams, TextInferenceInterface,
                               _bucket, _pick_token_rows, _rows_arrays,
                               _rows_flags)
from ..model import Model


@dataclass
class _Request:
    prompt_ids: np.ndarray
    n_new: int
    future: Future = field(default_factory=Future)
    on_token: Optional[Any] = None       # callback(token_id) for streaming
    cancelled: threading.Event = field(default_factory=threading.Event)
    # per-request sampling (vLLM-style): None = the batcher default
    sampling: Optional[SamplingParams] = None
    # per-request LoRA adapter name (multi-LoRA serving): None = base
    adapter: Optional[str] = None
    # arrival time (admission-coalescing deadline)
    t_arrival: float = field(default_factory=time.time)


@dataclass
class _Slot:
    req: Optional[_Request] = None
    emitted: List[int] = field(default_factory=list)
    # index of the first decode chunk that includes this request (its
    # admission update rides in with that chunk's dispatch); None until
    # dispatched — earlier chunks' rows for this slot belong to a
    # previous tenant and must not be emitted
    dispatched: Optional[int] = None
    # pipelined admission: (group dict, row) holding the DEVICE handle
    # of this row's first token, resolved at the drain of `dispatched`
    first_group: Optional[tuple] = None


class ContinuousBatcher:
    """model must be built with pos_per_row=True (per-row `pos` input).

    Sampling is PER REQUEST (submit(..., sampling=...)): every knob —
    temperature, top-k/top-p/min-p, the three penalties, and the seed —
    is a per-row device array inside the shared chunk program, so
    greedy and sampled requests batch together (net-beyond the
    reference, whose scheduler shares one generation config per job;
    crates/whisper-tensor-server/src/scheduler.rs). The program is
    lazily specialized on which features any live row actually uses
    (_rows_flags), so all-greedy traffic compiles to the same pure
    argmax program as before. The constructor `sampling` is the
    default for requests that don't pass their own.
    """

    def __init__(self, model: Model, max_len: int, max_batch: int = 8,
                 chunk: int = 16, cache_dtype: DType = DType.BF16,
                 prompt_buckets: Sequence[int] = (16, 32, 64, 128, 256),
                 eos_token_id: Optional[int] = None,
                 sampling: Optional[SamplingParams] = None,
                 prefill_chunk: Optional[int] = None,
                 prefix_ids: Optional[np.ndarray] = None,
                 quantize: Optional[str] = None,
                 adapters: "Optional[Dict[str, Dict[str, tuple]]]" = None,
                 chunk_max: Optional[int] = None,
                 admit_coalesce_s: float = 0.05,
                 auto_prefix: int = 0,
                 iface: "Optional[TextInferenceInterface]" = None,
                 max_admit: Optional[int] = None):
        """prefill_chunk: chunked prefill (vLLM-style admission QoS) —
        prompts longer than this are prefilled in prefill_chunk-token
        pieces, ONE piece per scheduler tick, so in-flight decode rows
        keep emitting between pieces instead of stalling behind a long
        monolithic prefill dispatch. None = whole-bucket prefill.

        prefix_ids: shared-prefix KV caching (system-prompt caching;
        generalizes the reference's longest-prefix RNN state cache,
        src/super_graph caches). The prefix is prefilled ONCE at B=1;
        every admission starts from a broadcast of its KV rows and
        prefills only the request's own tokens at pos=len(prefix).
        submit() prompts then EXCLUDE the prefix — outputs equal a
        plain batcher fed prefix+prompt, at a fraction of the
        admission compute.

        chunk_max: adaptive long-chunk dispatch. Each dispatch costs a
        fixed tunnel round-trip (~55 ms) plus a device->host fetch, so
        at serving batch sizes the loop is dispatch-bound, not
        HBM-bound. When the request queue is EMPTY, nothing is being
        admitted, and every live row verifiably has >= chunk_max tokens
        still to generate, the scheduler dispatches a chunk_max-step
        chunk instead of a chunk-step one — same program shape family,
        just a longer scan, so steady-state decode amortizes the fixed
        costs over many more tokens. New arrivals during a long chunk
        wait at most one long-chunk time for admission (the queue was
        empty when it was chosen). None disables (every dispatch uses
        `chunk`).

        admit_coalesce_s: admission coalescing under open-loop load.
        Every admission group costs one prefill dispatch PLUS a full
        device->host sync for the group's first tokens, so a stream of
        single-request admissions (steady arrivals) can spend more
        wall time on admission syncs than on decode. Arrivals are
        therefore held briefly and admitted together: a group forms
        when the waiting requests can fill every free slot, when the
        oldest waiter has aged past this deadline, or when the device
        has no decode work anyway (then admission is free). 0 restores
        admit-immediately.

        auto_prefix: AUTOMATIC prefix caching (vLLM-style, generalizing
        the configured prefix_ids machinery): an LRU pool of up to
        `auto_prefix` cached KV rows keyed by (adapter, 32-aligned
        prompt prefix). Admissions reuse the longest cached prefix of
        their prompt (prefilling only the remainder at pos=plen), and
        every admitted prompt of >= 32 tokens deposits its 32-aligned
        prefix row into the pool. Exactness falls out of the existing
        slot-reuse discipline: the tenant's suffix prefill overwrites
        [plen, L) and the position mask hides everything beyond. 0 =
        off; mutually exclusive with prefix_ids.

        iface: reuse an existing TextInferenceInterface instead of
        building one. Weights (possibly multi-GB, quantized+uploaded at
        interface build) and the shape-keyed compiled-program cache are
        then SHARED across batcher instances — a client-count sweep
        pays the model build once. The interface must have been built
        with the same max_len; model/cache_dtype/prompt_buckets/
        quantize args are ignored in that case.

        max_admit: cap on the admission group size (power-of-2 split
        still applies). An admission prefill at group size k allocates
        k-row temporaries (fresh caches + (k, bucket, V) logits); at
        the memory ceiling (8B int8 + N=256 slots on one 16 GB chip)
        uncapped groups OOM — a cap trades one extra admission
        dispatch for bounded temporaries. None = fill all free slots."""
        if iface is not None:
            if iface.max_len != max_len:
                raise ValueError(
                    f"shared iface max_len {iface.max_len} != {max_len}")
            self.iface = iface
        else:
            self.iface = TextInferenceInterface(
                model, max_len=max_len, cache_dtype=cache_dtype,
                prompt_buckets=prompt_buckets, quantize=quantize)
        if adapters:
            # multi-LoRA serving: per-ROW adapter selection inside every
            # shared program; submit(..., adapter=<name>) picks one
            self.iface.install_adapters(adapters)
        self.max_len = max_len
        # the decode chunk program is shaped (max_batch, ...): round the
        # slot count up to a power of two so the program never sits on
        # the measured non-pow2 XLA tiling cliff (B=768 runs 2.4x slower
        # than B=1024 on v5e) — extra slots are just admission capacity.
        if max_batch & (max_batch - 1):
            from ..interfaces.text import _next_pow2

            max_batch = _next_pow2(max_batch)
        self.max_batch = max_batch
        self.max_admit = max_admit
        self.chunk = chunk
        self.chunk_max = (None if chunk_max is None or chunk_max <= chunk
                          else int(chunk_max))
        # int or list (HF checkpoints may declare several end tokens);
        # eos_token_id stays the primary id, eos_token_ids the full set
        if eos_token_id is None or isinstance(eos_token_id, int):
            self.eos_token_id = eos_token_id
            self.eos_token_ids = (None if eos_token_id is None
                                  else (eos_token_id,))
        else:
            ids = tuple(int(e) for e in eos_token_id)
            self.eos_token_id = ids[0] if ids else None
            self.eos_token_ids = ids or None
        self.sampling = sampling
        self.park_pos = max_len - 1       # reserved scratch slot position
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._requests: Dict[Future, _Request] = {}   # for cancel()
        self._slots = [_Slot() for _ in range(max_batch)]
        # per-row adapter slot indices (0 = base), host-tracked and
        # passed with the weights on every dispatch
        self._row_lora = np.zeros(max_batch, np.int64)
        self._caches = None               # persistent batched KV caches
        # row state (cur token / position / active) lives ON DEVICE
        # between chunks; the host queues slot updates (admissions,
        # parks) that the NEXT chunk program applies in-graph — so the
        # host never re-uploads state and the loop can pipeline
        self._pending: Dict[int, tuple] = {}   # slot -> (cur, pos, active)
        self._row_state = None            # (rng, step, cur, pos, active)
        self._seen = None                 # (B, V) int32 penalty counts
        self.prefill_chunk = prefill_chunk
        self._admission: Optional[dict] = None   # in-flight chunked prefill
        self._admit_backlog: List[tuple] = []    # (slot, req) not yet started
        self._chunks_dispatched = 0
        self._tokens_emitted = 0
        self.admit_coalesce_s = admit_coalesce_s
        self._wait: List[_Request] = []   # arrived, not yet admitted
        # wall-clock accumulators per scheduler phase (observability:
        # the reference streams per-node timings; here the loop phases
        # are the units that matter) — seconds, monotonic totals
        self._t_admit = 0.0      # prefill dispatch + install
        self._t_dispatch = 0.0   # chunk-program dispatch calls
        self._t_fetch = 0.0      # blocking device->host drains
        self._steps_dispatched = 0
        # per-tick event timeline (diagnostics; WT_BATCH_TRACE=1)
        self._trace = ([] if os.environ.get("WT_BATCH_TRACE") else None)
        # adaptive-ladder AOT executables: a long-chunk program is only
        # DISPATCHED once its compile has finished — unseen lengths
        # compile on a background thread while the loop keeps serving
        # with the longest ready length (a mid-run ~8-60 s jit stall
        # measured as the dominant 8B serving cost otherwise)
        self._chunk_exec: Dict[tuple, Any] = {}
        self._chunk_compiling: set = set()
        # pipelined admissions: groups whose first tokens are still
        # device handles, waiting to ride into the next chunk dispatch
        self._dev_admits: List[dict] = []
        self.prefix_ids = (None if prefix_ids is None else
                           np.asarray(prefix_ids, np.int64).reshape(-1))
        self.prefix_len = 0 if self.prefix_ids is None \
            else int(self.prefix_ids.shape[0])
        self._prefix_caches = None        # B=1 KV rows for the prefix
        self.auto_prefix = int(auto_prefix)
        if self.auto_prefix and self.prefix_ids is not None:
            raise ValueError("auto_prefix and prefix_ids are exclusive")
        # (adapter, key bytes) -> {caches, plen, used}; LRU by `used`
        self._auto_pool: Dict[Any, dict] = {}
        self._auto_clock = 0
        self._auto_hits = 0
        self._auto_misses = 0
        self._row_slice_prog = None
        self._programs: Dict[Any, Any] = {}
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._draining = threading.Event()
        self._wake = threading.Event()

    # -- public API --------------------------------------------------------
    def submit(self, prompt_ids: np.ndarray, n_new: int,
               on_token=None,
               sampling: Optional[SamplingParams] = None,
               adapter: Optional[str] = None) -> Future:
        if adapter is not None and \
                adapter not in self.iface.adapter_slots:
            raise ValueError(
                f"unknown adapter {adapter!r} "
                f"(loaded: {[n for n in self.iface.adapter_slots if n]})")
        req = _Request(np.asarray(prompt_ids, np.int64).reshape(-1), n_new,
                       on_token=on_token, sampling=sampling,
                       adapter=adapter)
        self._requests[req.future] = req
        self._queue.put(req)
        self._wake.set()
        return req.future

    def _adapter_slot(self, req: _Request) -> int:
        return self.iface.adapter_slots.get(req.adapter, 0)

    def _weights_for(self, idx) -> list:
        """The weights list, with the per-row adapter indices appended
        when multi-LoRA is installed (the row-extras tail every
        compiled program expects)."""
        ws = self.iface._weights()
        if not self.iface.row_extra_names:
            return ws
        import jax.numpy as jnp

        return ws + [jnp.asarray(np.asarray(idx, np.int64))]

    def stats(self) -> dict:
        """Live scheduler snapshot (reference server's job/queue
        observability): slot occupancy, queue depth, emitted-token and
        chunk counters."""
        active = sum(1 for s in self._slots if s.req is not None)
        return {"slots": self.max_batch, "active": active,
                "queued": self._queue.qsize() + len(self._wait)
                + len(self._admit_backlog),
                "admitting": self._admission is not None,
                "chunks_dispatched": self._chunks_dispatched,
                "steps_dispatched": self._steps_dispatched,
                "tokens_emitted": self._tokens_emitted,
                "time_admit_s": round(self._t_admit, 3),
                "time_dispatch_s": round(self._t_dispatch, 3),
                "time_fetch_s": round(self._t_fetch, 3),
                "prefix_len": self.prefix_len,
                "auto_prefix": {"pool": len(self._auto_pool),
                                "hits": self._auto_hits,
                                "misses": self._auto_misses}
                if self.auto_prefix else None,
                "prefill_chunk": self.prefill_chunk,
                "chunk": self.chunk,
                "chunk_max": self.chunk_max}

    def cancel(self, future: Future) -> bool:
        """Cancel a submitted request (reference scheduler cancellation,
        src/scheduler.rs cancellation registry). A request not yet in a
        slot resolves immediately with zero tokens; a running request
        resolves with the tokens emitted SO FAR at the next scheduler
        tick and its slot frees for reuse. Returns False for unknown or
        already-finished futures."""
        req = self._requests.get(future)
        if req is None or future.done():
            return False
        req.cancelled.set()
        in_slot = any(s.req is req for s in self._slots)
        adm = self._admission
        in_adm = adm is not None and any(r is req for _, r in adm["grp"])
        if not in_slot and not in_adm:
            # still queued/backlogged: don't make the caller wait for a
            # slot to free — the admission loops will skip it later
            if not future.done():
                future.set_result(np.zeros(0, np.int64))
            self._requests.pop(future, None)
        self._wake.set()
        return True

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def drain(self, timeout: float = 600.0) -> bool:
        """Wait until every accepted request has finished, then stop.
        Used to swap batchers live (dynamic adapter loading) without
        dropping in-flight work — route NEW requests elsewhere first.

        Idleness is judged by the SCHEDULER THREAD between ticks (the
        _draining flag), never from outside: a request popped from the
        queue lives only in _tick locals until its admission installs
        it, so an external poll could observe a false-idle window and
        strand it. On timeout the batcher force-stops and every
        outstanding future gets a TimeoutError."""
        self._draining.set()
        self._wake.set()
        t = self._thread
        if t is not None:
            t.join(timeout=timeout)
        clean = t is None or not t.is_alive()
        if not clean:
            self.stop()
        for req in list(self._requests.values()):
            if not req.future.done():
                req.future.set_exception(TimeoutError(
                    "batcher drained with the request outstanding"))
        self._thread = None
        return clean

    # -- per-row sampling helpers -------------------------------------------
    def _slot_sp(self, slot: _Slot) -> Optional[SamplingParams]:
        """Effective SamplingParams for a slot's current tenant (its own,
        else the batcher default); None (greedy) for empty slots."""
        if slot.req is None:
            return None
        return slot.req.sampling or self.sampling

    def _ensure_seen(self):
        """The (B, V) per-row token-occurrence counts backing the
        repetition / presence / frequency penalties. Device-resident;
        admissions scatter prompt counts in, pen-variant chunks add
        each emitted token in-graph. Rows whose params are neutral
        never read it, so stale counts from earlier tenants are
        harmless."""
        if self._seen is None:
            import jax.numpy as jnp

            self._seen = jnp.zeros(
                (self.max_batch, self.iface._vocab_size()), jnp.int32)
        return self._seen

    def _seed_seen_rows(self, grp, firsts):
        """Scatter prefix+prompt+first-token occurrence counts into the
        admitted rows of the device seen array (only called when the
        group has a penalty-using request)."""
        import jax.numpy as jnp

        V = self.iface._vocab_size()
        rows = np.zeros((len(grp), V), np.int32)
        for r, (_, req) in enumerate(grp):
            ids = req.prompt_ids
            if self.prefix_ids is not None:
                ids = np.concatenate([self.prefix_ids, ids])
            np.add.at(rows[r], np.clip(ids, 0, V - 1), 1)
            rows[r, int(firsts[r])] += 1
        slots = np.asarray([s for s, _ in grp], np.int32)
        self._seen = self._ensure_seen().at[jnp.asarray(slots)].set(
            jnp.asarray(rows))

    def _first_tokens(self, grp, last, rng):
        """Admission-time first token for each admitted row, honoring
        every per-request sampling knob (eager ops; admissions are not
        the hot path)."""
        import jax.numpy as jnp

        sps = [req.sampling or self.sampling for _, req in grp]
        flags = _rows_flags(sps)
        rows = tuple(jnp.asarray(a) for a in _rows_arrays(sps))
        seen = None
        if flags[4]:
            V = self.iface._vocab_size()
            cnt = np.zeros((len(grp), V), np.int32)
            for r, (_, req) in enumerate(grp):
                ids = req.prompt_ids
                if self.prefix_ids is not None:
                    ids = np.concatenate([self.prefix_ids, ids])
                np.add.at(cnt[r], np.clip(ids, 0, V - 1), 1)
            seen = jnp.asarray(cnt)
        firsts = np.asarray(_pick_token_rows(jnp.asarray(last), rng, rows,
                                             flags, seen))
        if flags[4]:
            self._seed_seen_rows(grp, firsts)
        return firsts

    # -- compiled programs --------------------------------------------------
    def _prefill_insert_program(self, bucket: int, k: int,
                                la: bool = True,
                                plen: Optional[int] = None):
        """One dispatch admits k requests: prefill at B=k into the
        passed admission caches (zeros, or a broadcast of the shared
        prefix's KV at pos=prefix_len) and scatter the k cache rows
        into the batched cache at `slots` — admission cost amortizes
        over k (power-of-2 group sizes bound the compile count).
        la=False: all-base group, the adapter-free program variant."""
        import jax
        import jax.numpy as jnp

        plen = self.prefix_len if plen is None else plen
        key = ("prefill", bucket, k, plen, la)
        if key in self._programs:
            return self._programs[key]
        step = self.iface._traced_step(k, bucket, adapters=la)

        if plen == 0:
            # WINDOW admission (when the interface carries a step graph
            # built at max_len == bucket): fresh caches and the scatter
            # are bucket-length, so a k-row admission allocates
            # k x bucket KV temporaries instead of k x max_len. At the
            # memory ceiling (8B int8, 256 slots, one 16 GB chip) the
            # full-length temporaries alone are 6.4 GB and OOM the
            # admission. Positions >= bucket in the big rows keep stale
            # tenant data — hidden by the same position-mask discipline
            # the slot-reuse exactness tests pin (decode writes pos
            # before reading it).
            win = (bucket if bucket < self.max_len
                   and bucket in self.iface._window_millis
                   # window graphs carry no LoRA surgery: base-only
                   and len(self.iface.adapter_slots) <= 1 else None)
            if win is not None:
                wstep = self.iface._traced_step(k, bucket, adapters=la,
                                                window=win)
                dt = self.iface.cache_dtype.to_jax()
                wshapes = self.iface.window_cache_dims(k, win)

                def prefill0w(ids_padded, big, weights, slots):
                    fresh = [jnp.zeros(s, dt) for s in wshapes]
                    logits, small = wstep(ids_padded,
                                          jnp.zeros(k, dtype=jnp.int64),
                                          fresh, weights)
                    big2 = []
                    for b, s in zip(big, small):
                        idx = (slots,) + tuple(
                            slice(0, ds) if ds != db else slice(None)
                            for ds, db in zip(s.shape[1:], b.shape[1:]))
                        big2.append(b.at[idx].set(s.astype(b.dtype)))
                    return logits, big2

                self._programs[key] = jax.jit(prefill0w,
                                              donate_argnums=(1,))
                return self._programs[key]

            # no prefix: zero caches created IN-graph (no extra host
            # dispatches per admission through the tunnel)
            shapes = [(tuple(c.shape), c.dtype)
                      for c in self.iface.fresh_cache(k)]

            def prefill0(ids_padded, big, weights, slots):
                fresh = [jnp.zeros(s, d) for s, d in shapes]
                logits, small = step(ids_padded,
                                     jnp.zeros(k, dtype=jnp.int64),
                                     fresh, weights)
                big2 = [b.at[slots].set(s.astype(b.dtype))
                        for b, s in zip(big, small)]
                return logits, big2

            self._programs[key] = jax.jit(prefill0, donate_argnums=(1,))
            return self._programs[key]

        def prefill(ids_padded, big, weights, slots, small):
            # prefix mode: `small` is a k-row broadcast of the shared
            # prefix's KV; the suffix prefills at pos=prefix_len
            logits, small = step(ids_padded,
                                 jnp.full(k, plen, dtype=jnp.int64),
                                 small, weights)
            big2 = [b.at[slots].set(s.astype(b.dtype))
                    for b, s in zip(big, small)]
            return logits, big2

        self._programs[key] = jax.jit(prefill, donate_argnums=(1, 4))
        return self._programs[key]

    def _piece_program(self, w: int, k: int, la: bool = True):
        """One prefill PIECE: consume w prompt tokens at offset `pos`
        into the admission group's private k-row caches, and harvest
        each row's first-token logits when its last prompt token falls
        inside this piece (per-row lens). Pieces run one per scheduler
        tick so decode chunks interleave with long prefills."""
        import jax
        import jax.numpy as jnp

        key = ("piece", w, k, la)
        if key in self._programs:
            return self._programs[key]
        step = self.iface._traced_step(k, w, adapters=la)

        def piece(ids_w, pos, lens, flg, small, weights):
            logits, small = step(ids_w, jnp.full(k, pos, jnp.int64),
                                 small, weights)
            idx = lens - 1 - pos                     # (k,) in-piece offset
            hit = (idx >= 0) & (idx < w)
            g = logits[jnp.arange(k), jnp.clip(idx, 0, w - 1), :]
            flg = jnp.where(hit[:, None], g.astype(flg.dtype), flg)
            return flg, small

        self._programs[key] = jax.jit(piece, donate_argnums=(3, 4))
        return self._programs[key]

    def _splice_program(self, k: int):
        """Scatter a finished admission's k-row caches into the big
        batched cache at `slots` (donating the big buffers)."""
        import jax

        key = ("splice", k)
        if key in self._programs:
            return self._programs[key]

        def splice(big, small, slots):
            return [b.at[slots].set(s.astype(b.dtype))
                    for b, s in zip(big, small)]

        self._programs[key] = jax.jit(splice, donate_argnums=(0,))
        return self._programs[key]

    def _wf(self, gidx, la: bool):
        """Weights for a program variant: idx rides along only for the
        adapter variant (the base variant's graph has no lora inputs)."""
        return (self._weights_for(gidx) if la
                else self.iface._weights())

    def _ensure_prefix(self, adapter_slot: int = 0):
        """Prefill the shared prefix once per ADAPTER (B=1) and keep its
        KV rows on device; admissions broadcast from them instead of
        starting at zero. Per-adapter caches keep prefix semantics
        exact: an adapter request's prefix KV is computed UNDER that
        adapter, matching a plain prefix+prompt run of the adapted
        model (vLLM keys its prefix cache by adapter the same way)."""
        if self.prefix_ids is None:
            return None
        if self._prefix_caches is None:
            self._prefix_caches = {}
        cached = self._prefix_caches.get(adapter_slot)
        if cached is not None:
            return cached
        import jax
        import jax.numpy as jnp

        plen = self.prefix_len
        sb = _bucket(plen, self.iface.prompt_buckets)
        la = adapter_slot != 0
        step = self.iface._traced_step(1, sb, adapters=la)
        padded = np.zeros((1, sb), np.int64)
        padded[0, :plen] = self.prefix_ids

        def pre(ids, caches, weights):
            _, caches = step(ids, jnp.zeros(1, jnp.int64), caches, weights)
            return caches

        self._prefix_caches[adapter_slot] = jax.jit(
            pre, donate_argnums=(1,))(
            jnp.asarray(padded), self.iface.fresh_cache(1),
            self._wf([adapter_slot], la))
        return self._prefix_caches[adapter_slot]

    def _prefix_small(self, k: int, gidx=None):
        """k-row admission caches seeded from the prefix KV (fresh
        zeros when no prefix is configured). gidx: per-row adapter
        slots — each row broadcasts from ITS adapter's prefix."""
        if self.prefix_ids is None:
            return self.iface.fresh_cache(k)
        import jax.numpy as jnp

        slots = list(gidx) if gidx is not None else [0] * k
        if len(set(slots)) == 1:
            pc = self._ensure_prefix(slots[0])
            return [jnp.tile(c, (k,) + (1,) * (c.ndim - 1)) for c in pc]
        per_row = [self._ensure_prefix(s) for s in slots]
        return [jnp.concatenate([pr[ci] for pr in per_row], axis=0)
                for ci in range(len(per_row[0]))]

    def _chunk_program(self, flags, la: bool = True,
                       n_steps: Optional[int] = None):
        """The decode-chunk program. Slot updates (admissions / parks)
        queued on the host since the LAST dispatch ride in as scatter
        inputs and apply in-graph before the scan — row state never
        round-trips through the host, so the scheduler loop can keep a
        chunk in flight while it post-processes the previous one.

        `flags` (_rows_flags over the live rows' SamplingParams)
        statically specializes the program: the all-False variant is
        pure argmax, and each feature (categorical draw, top-k sort,
        top-p sort, min-p, the (B, V) seen-count carry for penalties)
        is only traced into variants that need it."""
        import jax
        import jax.numpy as jnp

        n_steps = self.chunk if n_steps is None else n_steps
        key = ("chunk", self.max_batch, n_steps, flags, la)
        if key in self._programs:
            return self._programs[key]
        step = self.iface._traced_step(self.max_batch, 1, adapters=la)
        eos = self.eos_token_ids
        park = self.park_pos
        mb = self.max_batch
        any_pen = flags[4]

        def run(cur, pos, active, caches, weights, rng_key, rows,
                upd_slots, upd_cur, upd_pos, upd_active, seen=None):
            # canonicalize: the initial state buffers may predate the
            # compiler enabling x64, and the scan carry must be stable
            cur = cur.astype(jnp.int64)
            pos = pos.astype(jnp.int64)
            # out-of-range slot index (== max_batch) pads unused rows
            cur = cur.at[upd_slots].set(upd_cur.astype(cur.dtype),
                                        mode="drop")
            pos = pos.at[upd_slots].set(upd_pos.astype(pos.dtype),
                                        mode="drop")
            active = active.at[upd_slots].set(upd_active, mode="drop")

            def body(carry, i):
                cur, pos, active, caches, seen = carry
                logits, caches = step(cur[:, None], pos, caches, weights)
                nxt = _pick_token_rows(logits[:, -1, :],
                                       jax.random.fold_in(rng_key, i),
                                       rows, flags, seen)
                nxt = jnp.where(active, nxt, cur)
                if any_pen:
                    seen = seen.at[jnp.arange(mb), nxt].add(
                        active.astype(seen.dtype))
                if eos is not None:
                    hit = nxt == eos[0]
                    for e in eos[1:]:
                        hit = hit | (nxt == e)
                    active = active & ~hit
                pos = jnp.where(active, jnp.minimum(pos + 1, park), pos)
                return (nxt, pos, active, caches, seen), (nxt, active)

            (cur, pos, active, caches, seen), (toks, actives) = jax.lax.scan(
                body, (cur, pos, active, caches, seen),
                jnp.arange(n_steps))
            # state rides out int32 (see _tick row-state pinning)
            out = (cur.astype(jnp.int32), pos.astype(jnp.int32), active,
                   caches,
                   jnp.swapaxes(toks, 0, 1), jnp.swapaxes(actives, 0, 1))
            return out + (seen,) if any_pen else out

        donate = (3, 11) if any_pen else (3,)
        if not any_pen:
            # keep the carry pytree static: a None leaf in/out
            def run_nopen(cur, pos, active, caches, weights, rng_key, rows,
                          upd_slots, upd_cur, upd_pos, upd_active):
                return run(cur, pos, active, caches, weights, rng_key,
                           rows, upd_slots, upd_cur, upd_pos, upd_active)
            prog = jax.jit(run_nopen, donate_argnums=(3,))
        else:
            prog = jax.jit(run, donate_argnums=donate)
        self._programs[key] = prog
        return prog

    def _chunk_runner(self, flags, la, want, args):
        """(n_steps, callable) for this tick's dispatch. The base
        `chunk` length compiles synchronously on first use (cold start,
        covered by admission warmup); LONGER adaptive-ladder lengths
        are AOT-compiled on a background thread and only dispatched
        once their executable is ready — until then the loop keeps
        serving with the longest ready length. Without this, the first
        mid-run ladder step jit-stalled the whole scheduler (measured:
        a 128-step chunk compile cost 8.7 s of an 11.2 s 8B timed
        serving run — the dominant term of the judged N=32 gap)."""
        import jax

        mb = self.max_batch
        n = want
        while n > self.chunk:
            key = ("chunk", mb, n, flags, la)
            comp = self._chunk_exec.get(key)
            if comp is not None:
                return n, comp
            if key not in self._chunk_compiling:
                try:
                    specs = jax.tree_util.tree_map(
                        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                        args)
                    # TRACE inline on this thread: the Pallas helpers
                    # toggle jax.enable_x64 around their own traces, so
                    # a concurrent background trace can canonicalize
                    # i64 args to i32 (observed: 'compiled with
                    # int32[64] and called with int64[64]'). Tracing is
                    # milliseconds; only the XLA compile (seconds, no
                    # config reads) goes to the background thread.
                    lowered = self._chunk_program(flags, la,
                                                  n).lower(*specs)
                except Exception:
                    n //= 2
                    continue
                self._chunk_compiling.add(key)

                def work(key=key, lowered=lowered):
                    try:
                        self._chunk_exec[key] = lowered.compile()
                    except Exception:
                        pass
                    finally:
                        self._chunk_compiling.discard(key)

                threading.Thread(target=work, daemon=True,
                                 name=f"wt-chunk-compile-{n}").start()
            n //= 2
        return self.chunk, self._chunk_program(flags, la, self.chunk)

    # -- scheduler loop ------------------------------------------------------
    def _match_auto_prefix(self, req: _Request, aslot: int):
        """Longest pool entry whose tokens strictly prefix the prompt
        (same adapter) -> (plen, entry) or (0, None)."""
        ids = req.prompt_ids
        L = ids.shape[0]
        best, best_plen = None, 0
        for (a, _kb), e in self._auto_pool.items():
            if a != aslot or e["plen"] <= best_plen or e["plen"] >= L:
                continue
            if ids[:e["plen"]].tobytes() == _kb:
                best, best_plen = e, e["plen"]
        if best is not None:
            self._auto_clock += 1
            best["used"] = self._auto_clock
        return best_plen, best

    def _slice_row(self, slot_idx: int):
        """Copy one slot's cache row out of the batched caches
        (async device op; the copy outlives slot reuse)."""
        import jax

        if self._row_slice_prog is None:
            def take(big, i):
                return [jax.lax.dynamic_slice_in_dim(c, i, 1, axis=0)
                        for c in big]

            self._row_slice_prog = jax.jit(take)
        return self._row_slice_prog(self._caches, slot_idx)

    def _store_auto_entries(self, grp, gidx):
        """Deposit each admitted prompt's 32-aligned prefix KV row
        into the pool (LRU-capped)."""
        for (slot_idx, req), a in zip(grp, gidx):
            L = int(req.prompt_ids.shape[0])
            pk = 32 * (L // 32)
            if pk < 32:
                continue
            key = (a, req.prompt_ids[:pk].tobytes())
            self._auto_clock += 1
            if key in self._auto_pool:
                self._auto_pool[key]["used"] = self._auto_clock
                continue
            self._auto_pool[key] = {
                "caches": self._slice_row(slot_idx), "plen": pk,
                "used": self._auto_clock}
            while len(self._auto_pool) > self.auto_prefix:
                victim = min(self._auto_pool,
                             key=lambda kk: self._auto_pool[kk]["used"])
                del self._auto_pool[victim]

    def _admit_group(self, pairs):
        """pairs: [(slot_idx, req)]; partitioned by matched auto-prefix
        entry (rows in one prefill share ONE pos offset and seed), then
        admitted in power-of-2 sub-groups (one compiled program per
        (bucket, k, plen))."""
        if not (self.auto_prefix and self.prefix_ids is None):
            self._admit_part(pairs, self.prefix_len, None)
            return
        tagged = []
        for sp in pairs:
            plen, entry = self._match_auto_prefix(
                sp[1], self._adapter_slot(sp[1]))
            if entry is not None:
                self._auto_hits += 1
            else:
                self._auto_misses += 1
            tagged.append((plen, id(entry), sp, entry))
        tagged.sort(key=lambda t: (t[0], t[1],
                                   t[2][1].prompt_ids.shape[0]))
        i = 0
        while i < len(tagged):
            j = i
            while j < len(tagged) and tagged[j][:2] == tagged[i][:2]:
                j += 1
            self._admit_part([t[2] for t in tagged[i:j]], tagged[i][0],
                             tagged[i][3])
            i = j

    def _admit_part(self, pairs, plen: int, entry: Optional[dict]):
        """One seed partition: prefill remainders at pos=plen from the
        entry's (or configured prefix's, or zero) KV seed."""
        import jax
        import jax.numpy as jnp

        rng = jax.random.PRNGKey(self.sampling.seed if self.sampling else 0)
        # auto-prefix rows feed only the REMAINDER tokens; the legacy
        # configured-prefix path's prompts already exclude the prefix
        cut = plen if entry is not None else 0
        i = 0
        k_cap = min(self.max_batch, self.max_admit or self.max_batch)
        while i < len(pairs):
            k = 1
            while k * 2 <= len(pairs) - i and k * 2 <= k_cap:
                k *= 2
            grp = pairs[i:i + k]
            i += k
            Sb = _bucket(max(r.prompt_ids.shape[0] - cut for _, r in grp),
                         self.iface.prompt_buckets)
            padded = np.zeros((k, Sb), np.int64)
            lens = []
            for row, (_, req) in enumerate(grp):
                rem = req.prompt_ids[cut:]
                padded[row, :rem.shape[0]] = rem
                lens.append(rem.shape[0])
            slots = np.asarray([s for s, _ in grp], np.int32)
            gidx = [self._adapter_slot(r) for _, r in grp]
            la = any(gidx)
            for (s, r), a in zip(grp, gidx):
                self._row_lora[s] = a
            args = [jnp.asarray(padded), self._caches,
                    self._wf(gidx, la), jnp.asarray(slots)]
            if entry is not None:
                args.append([jnp.tile(c, (k,) + (1,) * (c.ndim - 1))
                             for c in entry["caches"]])
            elif self.prefix_len:
                args.append(self._prefix_small(k, gidx))
            logits, self._caches = self._prefill_insert_program(
                Sb, k, la, plen)(*args)
            if self.auto_prefix:
                self._store_auto_entries(grp, gidx)
            last = logits[jnp.arange(k), jnp.asarray(lens) - 1, :]
            sps = [req.sampling or self.sampling for _, req in grp]
            flags = _rows_flags(sps)
            if flags[4]:
                # penalty rows need host-side seen seeding: keep the
                # synchronous admission for this (rare) group shape
                firsts = self._first_tokens(grp, last, rng)
                self._install_admitted(
                    grp, [plen + L for L in lens], firsts)
                continue
            # PIPELINED admission: the first token stays a device
            # handle — it rides into the next chunk dispatch as a
            # device scatter slice and is fetched with that chunk's
            # regular drain, so admission costs NO device->host sync
            rows_a = tuple(jnp.asarray(a) for a in _rows_arrays(sps))
            firsts_dev = _pick_token_rows(last, rng, rows_a, flags, None)
            act = jnp.asarray([req.n_new > 1 for _, req in grp])
            if self.eos_token_ids is not None:
                hit = firsts_dev == self.eos_token_ids[0]
                for e in self.eos_token_ids[1:]:
                    hit = hit | (firsts_dev == e)
                act = act & ~hit
            ga = {"slots": [s for s, _ in grp], "firsts": firsts_dev,
                  "active": act,
                  "pos": [min(plen + L, self.park_pos)
                          for L in lens],
                  "np": None}
            for row, (slot_idx, req) in enumerate(grp):
                slot = self._slots[slot_idx]
                slot.req = req
                slot.emitted = []
                slot.dispatched = None
                slot.first_group = (ga, row)
                # an older queued park for this slot (its previous
                # tenant's _finish) is subsumed: the admission writes
                # cur/pos/active itself and must win
                self._pending.pop(slot_idx, None)
            self._dev_admits.append(ga)

    def _install_admitted(self, grp, lens, firsts):
        """Common admission tail: record each row's first token, queue
        its device slot update, and retire single-token/EOS requests."""
        for row, (slot_idx, req) in enumerate(grp):
            slot = self._slots[slot_idx]
            if req.cancelled.is_set() or req.future.done():
                # cancelled while its admission was in flight: resolve
                # with nothing emitted, park the (already written) slot
                slot.req = req
                slot.emitted = []
                slot.dispatched = None
                self._finish(slot_idx)
                continue
            first = int(firsts[row])
            slot.req = req
            slot.emitted = [first]
            slot.dispatched = None
            self._tokens_emitted += 1
            if req.on_token is not None:
                req.on_token(first)
            eos_hit = (self.eos_token_ids is not None
                       and first in self.eos_token_ids)
            self._pending[slot_idx] = (
                first, min(int(lens[row]), self.park_pos),
                not eos_hit and req.n_new > 1)
            if req.n_new <= 1 or eos_hit:
                self._finish(slot_idx)

    def _advance_admission(self):
        """Chunked-prefill admission state machine: start a group when
        idle, then run ONE prefill piece per tick; on the final piece,
        splice the group's caches into the batched cache and install
        the rows. Decode chunks for already-running rows dispatch in
        the same ticks, so a long prompt never stalls token emission
        by more than one piece. A device failure mid-admission is
        handled by the _loop reset (all state rebuilt)."""
        import jax
        import jax.numpy as jnp

        from ..interfaces.text import _bucket as bucket_of

        W = self.prefill_chunk
        if self._admission is None:
            for i, slot in enumerate(self._slots):
                if slot.req is None and all(s != i for s, _ in
                                            self._admit_backlog):
                    try:
                        req = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if req.cancelled.is_set():
                        if not req.future.done():
                            req.future.set_result(np.zeros(0, np.int64))
                        self._requests.pop(req.future, None)
                        continue
                    self._requests.setdefault(req.future, req)
                    self._admit_backlog.append((i, req))
            if not self._admit_backlog:
                return
            # FIFO: take the OLDEST pow-2 group (a global sort-by-length
            # would starve a long prompt under sustained short load —
            # similar lengths still tend to cluster via the shared
            # bucket, and fairness beats marginal bucketing efficiency)
            k = 1
            while (k * 2 <= len(self._admit_backlog)
                   and k * 2 <= self.max_batch):
                k *= 2
            grp = self._admit_backlog[:k]
            self._admit_backlog = self._admit_backlog[k:]
            max_l = max(r.prompt_ids.shape[0] for _, r in grp)
            if bucket_of(max_l, self.iface.prompt_buckets) <= W:
                # short group — the monolithic path is already one
                # small dispatch
                try:
                    self._admit_group(grp)
                except Exception as e:  # noqa: BLE001
                    for _, req in grp:
                        if not req.future.done():
                            req.future.set_exception(e)
                return
            n_pieces = -(-max_l // W)
            padded = np.zeros((k, n_pieces * W), np.int64)
            lens = np.zeros(k, np.int64)
            for row, (i, req) in enumerate(grp):
                L = req.prompt_ids.shape[0]
                padded[row, :L] = req.prompt_ids
                lens[row] = self.prefix_len + L   # absolute position
                # reserve the slot (dispatched stays None, so drains
                # skip it and decode updates don't touch it)
                self._slots[i].req = req
                self._slots[i].emitted = []
                self._slots[i].dispatched = None
            gidx = [self._adapter_slot(r) for _, r in grp]
            for (s, r), a in zip(grp, gidx):
                self._row_lora[s] = a
            self._admission = dict(
                grp=grp, k=k, piece=0, n=n_pieces, padded=padded,
                lens_np=lens, lens=jnp.asarray(lens), gidx=gidx,
                la=any(gidx),
                flg=jnp.zeros((k, self.iface._vocab_size()), jnp.float32),
                small=self._prefix_small(k, gidx))
        st = self._admission
        j = st["piece"]
        st["flg"], st["small"] = self._piece_program(
            W, st["k"], st["la"])(
            jnp.asarray(st["padded"][:, j * W:(j + 1) * W]),
            jnp.asarray(self.prefix_len + j * W, jnp.int64), st["lens"],
            st["flg"], st["small"], self._wf(st["gidx"], st["la"]))
        st["piece"] += 1
        if st["piece"] < st["n"]:
            return
        self._admission = None
        slots_np = np.asarray([s for s, _ in st["grp"]], np.int32)
        self._caches = self._splice_program(st["k"])(
            self._caches, st["small"], jnp.asarray(slots_np))
        rng = jax.random.PRNGKey(self.sampling.seed if self.sampling else 0)
        firsts = self._first_tokens(st["grp"], st["flg"], rng)
        self._install_admitted(st["grp"], st["lens_np"], firsts)

    def _finish(self, slot_idx: int):
        slot = self._slots[slot_idx]
        req = slot.req
        if req is not None and not req.future.done():
            req.future.set_result(np.asarray(slot.emitted[:req.n_new],
                                             np.int64))
        if req is not None:
            self._requests.pop(req.future, None)
        slot.req = None
        slot.emitted = []
        slot.dispatched = None
        slot.first_group = None
        self._row_lora[slot_idx] = 0
        # park the device row at the next dispatch (harmless if it keeps
        # decoding for one in-flight chunk first — its writes land at
        # positions no future tenant will read below its own pos)
        self._pending[slot_idx] = (0, self.park_pos, False)

    def _loop(self):
        """Pipelined scheduler: dispatch chunk k+1 (with queued slot
        updates applied in-graph) BEFORE blocking on chunk k's host
        fetch — the ~0.1-0.3 s device->host sync through the dispatch
        tunnel overlaps the next chunk's execution instead of
        serializing with it.

        A tick failure (OOM, a poisoned program, a dropped device
        tunnel) fails every outstanding future with the cause and
        resets to an empty state — mirroring the reference scheduler's
        per-job error reporting (crates/whisper-tensor-server/src/
        scheduler.rs job Err arm) instead of killing the serving
        thread."""
        inflight = None                  # (idx, toks, actives, pos) handles
        while not self._stop.is_set():
            if (self._draining.is_set() and inflight is None
                    and all(s.req is None for s in self._slots)
                    and self._queue.empty() and not self._wait
                    and self._admission is None
                    and not self._admit_backlog):
                # drain(): judged HERE, between ticks, where no request
                # can be hiding in _tick locals
                return
            try:
                inflight = self._tick(inflight)
            except Exception as e:  # noqa: BLE001 — keep serving
                for slot in self._slots:
                    if slot.req is not None and not slot.req.future.done():
                        slot.req.future.set_exception(e)
                    slot.req = None
                    slot.emitted = []
                    slot.dispatched = None
                    slot.first_group = None
                while True:
                    try:
                        req = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if not req.future.done():
                        req.future.set_exception(e)
                for _, req in self._admit_backlog:
                    if not req.future.done():
                        req.future.set_exception(e)
                for req in self._wait:
                    if not req.future.done():
                        req.future.set_exception(e)
                self._wait = []
                self._dev_admits = []
                self._admit_backlog = []
                self._admission = None
                self._pending = {}
                self._requests = {}
                # the chunk program donates the caches, so after a
                # failed dispatch they may be invalid — rebuild row
                # state and caches from scratch on the next tick
                self._caches = None
                self._row_state = None
                self._seen = None
                inflight = None

    def _pick_chunk_len(self, inflight) -> int:
        """Adaptive chunk length (see chunk_max in __init__): the
        largest power-of-two multiple of `chunk` (capped at chunk_max)
        that every live row verifiably still needs, counting the whole
        in-flight (not yet fetched) chunk against each row — so no
        row's slot could have opened for a waiting request during the
        long scan, and no client waits on steps its request can't use.
        Long chunks are considered only when nothing is mid-admission
        and either the queue is empty or no slot can possibly open
        (all occupied, EOS-free config). Sampled rows may still park
        early mid-chunk; those steps are wasted compute, never wrong
        output (actives gates emission)."""
        if self.chunk_max is None:
            return self.chunk
        if self._admit_backlog or self._admission is not None:
            return self.chunk
        if not self._queue.empty() or self._wait:
            # waiting requests: a long chunk is still free ONLY when no
            # slot can possibly open during it — all slots occupied and
            # none can retire mid-chunk (the remaining bound covers
            # n_new; EOS can park a sampled row early, so any EOS
            # config keeps the short chunk while work is queued)
            if self.eos_token_ids is not None \
                    or any(s.req is None for s in self._slots):
                return self.chunk
        pending_lag = inflight[1].shape[1] if inflight is not None else 0
        min_remaining = self.chunk_max
        for slot in self._slots:
            if slot.req is None:
                continue
            # a pipelined admission's first token is not in emitted yet
            first_pending = 1 if slot.first_group is not None else 0
            remaining = (slot.req.n_new - len(slot.emitted)
                         - pending_lag - first_pending)
            if remaining < min_remaining:
                min_remaining = remaining
        # ladder: chunk, 2*chunk, 4*chunk, ... <= min(remaining, max)
        n = self.chunk
        while n * 2 <= min_remaining and n * 2 <= self.chunk_max:
            n *= 2
        return n

    def _drain_arrivals(self):
        """Move queued arrivals into the host-side wait list (dropping
        already-cancelled ones) so admission policy can look at ages
        and counts — queue.Queue cannot be peeked."""
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            if req.cancelled.is_set():          # cancelled in queue
                if not req.future.done():
                    req.future.set_result(np.zeros(0, np.int64))
                self._requests.pop(req.future, None)
                continue
            # re-register: a tick-failure reset may have swapped the
            # registry while submit() was between its two statements
            self._requests.setdefault(req.future, req)
            self._wait.append(req)

    def _admit_now(self, free) -> bool:
        """Admission-coalescing policy (see admit_coalesce_s): admit
        when the waiters can fill every free slot, the oldest waiter
        is past its deadline, or the device is idle (admission then
        costs nothing it could have overlapped with)."""
        kept = []
        for r in self._wait:
            if r.cancelled.is_set():            # cancelled while waiting
                if not r.future.done():
                    r.future.set_result(np.zeros(0, np.int64))
                self._requests.pop(r.future, None)
            else:
                kept.append(r)
        self._wait = kept
        if not self._wait:
            return False
        if self.admit_coalesce_s <= 0:
            return True
        if len(self._wait) >= len(free):
            return True
        if time.time() - self._wait[0].t_arrival >= self.admit_coalesce_s:
            return True
        return not any(slot.req is not None for slot in self._slots)

    def _tick(self, inflight):
        """One scheduler iteration: admit, dispatch, drain the
        previously in-flight chunk. Returns the new in-flight handles
        (dispatched this tick, fetched next tick)."""
        import jax
        import jax.numpy as jnp

        trace = getattr(self, "_trace", None)

        def tr(ev, **kw):
            if trace is not None:
                trace.append((time.time(), ev, kw))

        tr("tick_start")
        mb = self.max_batch
        if self._caches is None:
            self._caches = self.iface.fresh_cache(mb)
        if self._row_state is None:
            # row state is pinned int32 at the program boundary (the
            # program upcasts internally): dtype-stable signatures keep
            # ONE chunk executable regardless of x64-context timing in
            # other traces (the Pallas wrappers toggle x64 around their
            # own pallas_call builds)
            self._row_state = (
                jax.random.PRNGKey(self.sampling.seed if self.sampling
                                   else 0),
                0,                                     # step_count
                jnp.zeros(mb, jnp.int32),              # cur token
                jnp.full(mb, self.park_pos, jnp.int32),  # pos
                jnp.zeros(mb, bool))                   # active
        rng, step_count, dcur, dpos, dact = self._row_state
        # retire cancelled rows first: their future resolves with the
        # tokens emitted so far and the slot parks/frees
        for i, slot in enumerate(self._slots):
            if (slot.req is not None and slot.req.cancelled.is_set()
                    and slot.dispatched is not None):
                self._finish(i)
        # admit queued requests into free slots (batched prefill;
        # sorted by length so groups share a bucket)
        if self.prefill_chunk is not None:
            self._advance_admission()
        else:
            self._drain_arrivals()
            free = [i for i, slot in enumerate(self._slots)
                    if slot.req is None]
            if self._wait and free and self._admit_now(free):
                taken, self._wait = (self._wait[:len(free)],
                                     self._wait[len(free):])
                pairs = list(zip(free, taken))
                pairs.sort(key=lambda p: p[1].prompt_ids.shape[0])
                t0 = time.time()
                try:
                    self._admit_group(pairs)
                except Exception as e:  # noqa: BLE001
                    for _, req in pairs:
                        if not req.future.done():
                            req.future.set_exception(e)
                self._t_admit += time.time() - t0
        # a slot reserved by an in-flight chunked admission (dispatched
        # None, no pending update yet) is not decodable work; a
        # pipelined admission (device first-token handle) IS — its
        # update rides with the next dispatch
        work = bool(self._dev_admits) or any(
            s.req is not None
            and (s.dispatched is not None or i in self._pending)
            for i, s in enumerate(self._slots))
        new_inflight = None
        if work:
            # fold queued slot updates into fixed-shape scatter
            # inputs (index mb == out of range -> dropped pad)
            upd_s = np.full(mb, mb, np.int32)
            upd_c = np.zeros(mb, np.int32)
            upd_p = np.full(mb, self.park_pos, np.int32)
            upd_a = np.zeros(mb, bool)
            for j, (s, (c, p, a)) in enumerate(self._pending.items()):
                upd_s[j], upd_c[j], upd_p[j], upd_a[j] = s, c, p, a
                slot = self._slots[s]
                if slot.req is not None and slot.dispatched is None:
                    slot.dispatched = step_count
            j = len(self._pending)
            self._pending = {}
            # pipelined admissions: first tokens are DEVICE slices —
            # scatter them into the update arrays without any host
            # fetch. A row is live only while its slot still points at
            # this group (a later _finish — e.g. cancel-during-
            # admission — clears first_group and queues the winning
            # park instead).
            upd_c_d = upd_a_d = None
            for ga in self._dev_admits:
                keep = [r for r, sl in enumerate(ga["slots"])
                        if (self._slots[sl].first_group is not None
                            and self._slots[sl].first_group[0] is ga)]
                if not keep:
                    continue
                firsts = ga["firsts"]
                act = ga["active"]
                if len(keep) != len(ga["slots"]):
                    ki = jnp.asarray(keep)
                    firsts, act = firsts[ki], act[ki]
                if upd_c_d is None:
                    upd_c_d = jnp.asarray(upd_c)
                    upd_a_d = jnp.asarray(upd_a)
                upd_c_d = jax.lax.dynamic_update_slice(
                    upd_c_d, firsts.astype(upd_c_d.dtype), (j,))
                upd_a_d = jax.lax.dynamic_update_slice(upd_a_d, act, (j,))
                for r in keep:
                    sl = ga["slots"][r]
                    upd_s[j] = sl
                    upd_p[j] = ga["pos"][r]
                    j += 1
                    if self._slots[sl].req is not None:
                        self._slots[sl].dispatched = step_count
            self._dev_admits = []
            if upd_c_d is not None:
                upd_c, upd_a = upd_c_d, upd_a_d
            # per-row sampling params for every slot (parked rows are
            # neutral/greedy — their picks are discarded by `active`)
            sps = [self._slot_sp(s) for s in self._slots]
            flags = _rows_flags(sps)
            rows = tuple(jnp.asarray(a) for a in _rows_arrays(sps))
            # all-base chunks run the adapter-free program variant
            # (the masked-einsum bypass costs ~4.6% even on slot 0)
            la = (bool(self.iface.row_extra_names)
                  and bool(self._row_lora.any()))
            args = (dcur, dpos, dact, self._caches,
                    self._wf(self._row_lora, la),
                    jax.random.fold_in(rng, step_count), rows,
                    jnp.asarray(upd_s), jnp.asarray(upd_c),
                    jnp.asarray(upd_p), jnp.asarray(upd_a))
            if flags[4]:
                args = args + (self._ensure_seen(),)
            n_steps, runner = self._chunk_runner(
                flags, la, self._pick_chunk_len(inflight), args)
            tr("argprep_done", n_steps=n_steps)
            t0 = time.time()
            if flags[4]:
                (dcur, dpos, dact, self._caches, toks, actives,
                 self._seen) = runner(*args)
            else:
                dcur, dpos, dact, self._caches, toks, actives = runner(*args)
            self._t_dispatch += time.time() - t0
            tr("dispatch_done", n_steps=n_steps)
            new_inflight = (step_count, toks, actives, dpos)
            step_count += 1
            self._chunks_dispatched += 1
            self._steps_dispatched += int(toks.shape[1])
        self._row_state = (rng, step_count, dcur, dpos, dact)
        if inflight is not None:
            # ONE host fetch per chunk; blocks until THAT chunk is
            # done while the freshly dispatched one keeps the device
            # busy
            chunk_idx = inflight[0]
            t0 = time.time()
            toks, actives_np, pos_np = jax.device_get(inflight[1:])
            self._t_fetch += time.time() - t0
            tr("fetch_done")
            self._drain_chunk(chunk_idx, toks, actives_np, pos_np)
            tr("drain_done")
        elif not work and self._admission is None \
                and not self._admit_backlog and not self._wait:
            self._wake.wait(timeout=0.05)
            self._wake.clear()
        return new_inflight

    def _drain_chunk(self, chunk_idx, toks, actives_np, pos_np):
        """Emit a fetched chunk's tokens and retire finished slots.

        Bookkeeping lags the device by one in-flight chunk: a row that
        hits its n_new cap keeps decoding until its park update lands.
        Those extra tokens are dropped here, and the cache-write
        discipline (a tenant only reads positions below its own pos,
        all freshly written) keeps stale rows harmless."""
        for i, slot in enumerate(self._slots):
            req = slot.req
            if req is None:
                continue
            if req.future.done():           # failed admission cleanup
                self._finish(i)
                continue
            if slot.dispatched is None or chunk_idx < slot.dispatched:
                # admitted after this chunk was dispatched — these rows
                # belong to the slot's previous tenant
                continue
            if slot.first_group is not None:
                # pipelined admission: THIS chunk carried the row's
                # admission — its first token is ready on device now
                # (the prefill preceded this chunk in program order)
                ga, row = slot.first_group
                slot.first_group = None
                if ga["np"] is None:
                    ga["np"] = np.asarray(ga["firsts"])
                first = int(ga["np"][row])
                slot.emitted.append(first)
                self._tokens_emitted += 1
                if req.on_token is not None:
                    req.on_token(first)
                eos_hit = (self.eos_token_ids is not None
                           and first in self.eos_token_ids)
                if req.n_new <= 1 or eos_hit:
                    self._finish(i)
                    continue
            was_active = True
            for j in range(toks.shape[1]):   # this chunk's actual length
                if not was_active or len(slot.emitted) >= req.n_new:
                    break
                tok = int(toks[i, j])
                slot.emitted.append(tok)
                self._tokens_emitted += 1
                if req.on_token is not None:
                    req.on_token(tok)
                was_active = bool(actives_np[i, j])
            if len(slot.emitted) >= req.n_new or not was_active \
                    or pos_np[i] >= self.park_pos:
                self._finish(i)
