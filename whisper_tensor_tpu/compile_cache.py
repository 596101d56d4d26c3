"""Persistent XLA compilation cache.

The headline GPT-2 bench fuses every decode-window phase into one jitted
program; compiling that program from scratch costs ~9 minutes on the
axon-tunneled v5e (BENCH_r02 tail: 556 s compile+warmup) even though its
shapes never change between runs. JAX's persistent compilation cache
(`jax_compilation_cache_dir`) serializes each compiled executable keyed
on (HLO, compile options, platform version); a second process with the
same program deserializes instead of recompiling — measured here at
0.9 s -> 0.02 s for a toy program and minutes -> seconds for the bench.

Enabled by default at every framework entry point (bench, interfaces via
the XLA compiler chokepoint, server, CLI, graft entry). Opt out with
WT_COMPILE_CACHE=0; point elsewhere with WT_COMPILE_CACHE=/path.

The reference has no equivalent (its Cranelift sandbox recompiles per
process, `src/compiler/`); this is a TPU-operational necessity — every
driver round and every server cold-start pays the compile tail.
"""

from __future__ import annotations

import os
import threading

_LOCK = threading.Lock()
_DONE = False

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_compile_cache")


def _host_fingerprint() -> str:
    """Stable fingerprint of this host's CPU capabilities.

    XLA:CPU caches AOT-compiled executables whose cache key does NOT
    include the host's instruction-set features; an entry compiled on a
    machine with (say) AMX/AVX-512 extensions loads on a lesser host
    with a 'could lead to SIGILL' error. Scoping the cache directory by
    a flags fingerprint makes each distinct host population its own
    cache instead of sharing incompatible machine code. (TPU
    executables are keyed by platform version and are unaffected — but
    scoping them too is harmless and keeps this logic platform-blind.)
    """
    import hashlib
    import platform

    bits = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    bits += ":" + flags
                    break
    except OSError:
        bits += ":" + platform.processor()
    return hashlib.sha1(bits.encode()).hexdigest()[:12]


def enable_persistent_cache(path: str | None = None) -> bool:
    """Idempotently enable JAX's on-disk compilation cache.

    Returns True if the cache is (now) enabled, False if disabled via
    WT_COMPILE_CACHE=0 or if configuration failed (e.g. jax already
    locked its config in an incompatible state) — failure is never
    fatal, it just means compiles aren't cached.
    """
    global _DONE
    with _LOCK:
        if _DONE:
            return True
        env = os.environ.get("WT_COMPILE_CACHE", "")
        if env == "0":
            return False
        cache_dir = path or (env if env else os.path.abspath(DEFAULT_DIR))
        cache_dir = os.path.join(cache_dir, _host_fingerprint())
        try:
            import jax

            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # cache everything: tiny entries and fast compiles included —
            # the axon tunnel makes even small recompiles cost dispatch
            # round-trips, and disk is cheap.
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
            _DONE = True
            return True
        except Exception:
            return False
