"""Process-level frozen-artifact store for spec builders.

The drift monitor's (mu, v) top-PC direction and the incremental-dedup /
incremental-IVF codebooks are FROZEN artifacts in the contract their
specs model: a periodic batch job trains them, every query and
streaming gate then applies them map-side without retraining (the
streaming twins in ``streaming/monitor.py`` / ``streaming/sinks.py``
take them as arguments for exactly this reason). Re-training inside
every spec invocation mispriced the steady-state query ~5× in the
bench (VERDICT r10 — ``embedding_drift_buckets`` and
``semantic_dedup_frozen_keep`` were the two most expensive headliners,
each dominated by its training passes).

This memo is the in-process stand-in for that artifact store. Caching
is safe because every recipe here is exact-integer deterministic (the
kmeans/PCA pipelines are floor-arithmetic over quantized vectors — same
input → bit-identical artifact) and the cached value is O(d) / O(k·d)
Python ints, never a DataFrame; the DuckDB oracle recomputes the
artifact independently, so a stale cache would FAIL the hash gate, not
silently pass. Keys must include the sf dir plus every training
parameter. Specs whose priced contract includes training
(``semantic_dedup_keep``, the ann_* faces) must NOT use this.
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")

_STORE: dict[tuple, object] = {}


def frozen(key: tuple, train: Callable[[], T]) -> T:
    """Return the artifact under ``key``, training it on first use."""
    if key not in _STORE:
        _STORE[key] = train()
    return _STORE[key]  # type: ignore[return-value]
