"""Bounded top-k priority queue — semantics of utils/BoundedPQueue.java:28-47.

Reference behavior: a capacity-k queue; when full, ``offer(e)`` compares the
new element against the current minimum and keeps the better one (the
reference uses a reversed comparator + eviction of the worst). Here: a
min-heap of at most k entries ordered by (score asc, url desc) so the root
is the globally worst kept element; pops return best-first.

Used by frontier shards to keep a bounded in-memory head of the pending
queue (the cold tail spills to the checkpoint table at scale).
"""

from __future__ import annotations

import heapq


class _Rev(str):
    """String with reversed ordering — gives (score asc, url DESC) heap order
    so that eviction removes the entry that sorts LAST under the crawl order
    (score desc, url asc)."""

    __slots__ = ()

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)


class BoundedPQueue:
    def __init__(self, capacity: int):
        assert capacity > 0
        self.capacity = capacity
        self._heap: list[tuple[float, _Rev, object]] = []

    def __len__(self) -> int:
        return len(self._heap)

    def offer(self, score: float, url: str, payload=None) -> bool:
        """Insert keeping only the best ``capacity`` elements under
        (score desc, url asc). Returns False when the element was rejected
        (worse than the current worst of a full queue)."""
        item = (score, _Rev(url), payload)
        if len(self._heap) < self.capacity:
            heapq.heappush(self._heap, item)
            return True
        worst = self._heap[0]
        # item is better than worst iff worst < item under heap order
        if worst < item:
            heapq.heapreplace(self._heap, item)
            return True
        return False

    def drain_best_first(self) -> list[tuple[float, str, object]]:
        """Pop everything, best (highest score, then lexicographically
        smallest url) first. Empties the queue."""
        out = sorted(self._heap, key=lambda t: (-t[0], str(t[1])))
        self._heap.clear()
        return [(s, str(u), p) for s, u, p in out]

    def peek_worst(self):
        return self._heap[0] if self._heap else None
