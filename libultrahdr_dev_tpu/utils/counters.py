"""Process-wide event counters for observability.

The device-accelerated paths (TPU entropy encode/decode, packed
readback) all have host fallbacks so a platform quirk never takes down
a serving loop — but a silent fallback turns a 30x path into host
speed with nothing naming it. Every fallback site increments a counter
here (and logs a warning); bench.py snapshots them into its detail
block so a regression shows up as a nonzero counter in the round
artifact. Analog of the reference's ALOGW-on-degraded-path habit
(/root/reference/lib/src/jpegr.cpp error funnels).
"""

from __future__ import annotations

import threading
from collections import defaultdict

_lock = threading.Lock()
_counters: dict[str, int] = defaultdict(int)


def bump(name: str, n: int = 1) -> None:
    with _lock:
        _counters[name] += n


def snapshot() -> dict[str, int]:
    with _lock:
        return dict(_counters)


def reset() -> None:
    with _lock:
        _counters.clear()
