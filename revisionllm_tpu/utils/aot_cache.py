"""AOT executable cache: skip XLA recompilation across processes.

The reference amortizes nothing — torch eager pays kernel-launch overhead
per op instead of compile time. Under jit the compile cost is real (the
stage-1 program costs ~1-5 min over the axon relay, and the client-side
persistent compilation cache does not populate when compilation happens
server-side), so we serialize the *compiled executable* itself
(jax.experimental.serialize_executable) keyed by a hash of the lowered
StableHLO: any code, shape, dtype, or sharding change produces different
HLO and therefore a different key — sound invalidation by construction.

Verified on the axon relay: a fresh process deserializes and runs with zero
recompilation. Enable in the eval engine with REVISIONLLM_AOT_CACHE=<dir>.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import logging

import jax

log = logging.getLogger("revisionllm_tpu.aot_cache")


def cache_dir_from_env() -> Optional[str]:
    return os.environ.get("REVISIONLLM_AOT_CACHE") or None


def _key(lowered) -> str:
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(jax.default_backend().encode())
    dev = jax.devices()[0]
    h.update(getattr(dev, "device_kind", str(dev)).encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:32]


def load_or_compile(fn: Callable, *example_args, cache_dir: Optional[str] = None) -> Any:
    """Lower fn(*example_args), then return a cached executable if this exact
    program was compiled before (same code/shapes/backend), else compile and
    persist. With cache_dir=None just returns jax.jit(fn) untouched."""
    if cache_dir is None:
        return jax.jit(fn)

    lowered = jax.jit(fn).lower(*example_args)
    key = _key(lowered)
    path = os.path.join(cache_dir, f"{key}.jaxexe")
    if os.path.exists(path):
        try:
            from jax.experimental.serialize_executable import deserialize_and_load

            with open(path, "rb") as fh:
                ser, in_tree, out_tree, dev_ids = pickle.load(fh)
            by_id = {d.id: d for d in jax.devices()}
            compiled = deserialize_and_load(
                ser, in_tree, out_tree,
                # rebuild on the exact device set the program was compiled
                # for — the default (all visible devices) breaks when a
                # single-device program loads on a multi-device host
                execution_devices=[by_id[i] for i in dev_ids],
            )
            log.info("aot_cache hit %s", key)
            return compiled
        except Exception as e:  # stale/incompatible blob: recompile
            log.warning("aot_cache load failed (%s); recompiling", e)

    compiled = lowered.compile()
    try:
        from jax.experimental.serialize_executable import serialize

        os.makedirs(cache_dir, exist_ok=True)
        ser, in_tree, out_tree = serialize(compiled)
        dev_ids = [d.id for d in compiled.runtime_executable().local_devices()]
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump((ser, in_tree, out_tree, dev_ids), fh)
        os.replace(tmp, path)  # atomic: concurrent evals race safely
        log.info("aot_cache store %s (%d bytes)", key, len(ser))
    except Exception as e:  # serialization is best-effort
        log.warning("aot_cache store failed (%s)", e)
    return compiled


class LazyCachedProgram:
    """Defers lower/compile until the first call (the engine builds programs
    before it has example arrays); thereafter behaves like the executable."""

    def __init__(self, fn: Callable, cache_dir: Optional[str]):
        self._fn = fn
        self._cache_dir = cache_dir
        self._compiled: Any = None

    def __call__(self, *args):
        if self._compiled is None:
            self._compiled = load_or_compile(
                self._fn, *args, cache_dir=self._cache_dir
            )
        return self._compiled(*args)
