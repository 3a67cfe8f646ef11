"""Broadcast-state helpers for task-based lookup stages.

The engine's broadcast pattern: ship state once with ``ray.put`` and read
it inside plain map_batches FUNCTIONS per batch — ``ray.get`` of a local
plasma object is ~µs and zero-copy for numpy, and the warm long-lived task
pool avoids the cold-process cost of dedicated actor pools (actors are
reserved for genuinely stateful stages). State that needs deserialization
(filter payloads, pickled dicts, object-dtype arrays) goes through
``cached_broadcast`` so each worker process pays the deserialization ONCE,
giving actor-style caching without actor processes.
"""

from __future__ import annotations

_CACHE: dict[str, object] = {}


def cached_broadcast(ref, ctor):
    """``ctor(ray.get(ref))``, memoized per worker process by object ref.

    Bounded (8 entries, FIFO) — broadcast state is few-per-pipeline; the
    bound only guards long-lived workers that serve many pipelines.
    """
    import ray

    key = ref.hex()
    obj = _CACHE.get(key)
    if obj is None:
        obj = ctor(ray.get(ref))
        if len(_CACHE) >= 8:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = obj
    return obj
