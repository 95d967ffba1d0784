"""Per-worker-process cache for broadcast side inputs.

``ray.put`` ships one immutable copy to the object store; workers
``ray.get`` it back. But a plain ``ray.get(ref)`` inside a per-batch
function deserializes the object (e.g. a pandas DataFrame) on EVERY
batch. This cache deserializes once per worker process and reuses the
Python object across batches — the same pattern as the extract
kernel's ``_cached_minhasher`` / ``_VERIFY_STATE`` caches.

At 100 TB: one object-store copy per node (Ray dedups by ref), one
heap deserialization per worker process, zero per-batch cost.
"""

from __future__ import annotations

from typing import Any, Dict

_CACHE: Dict[str, Any] = {}


def cached_get(ref) -> Any:
    """``ray.get(ref)`` memoized per worker process by object-ref id."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else str(id(ref))
    if key not in _CACHE:
        if len(_CACHE) > 16:  # bound worker heap across many jobs
            _CACHE.clear()
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
