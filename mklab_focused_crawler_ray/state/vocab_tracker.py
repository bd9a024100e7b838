"""Checkpointable windowed-vocabulary tracker — EventDetectionBolt's
cross-window state made explicit and resumable.

The reference keeps the last N window vocabularies in an instance-local
FIFO (``utils/Snapshots.java:14-23``) inside a single bolt instance —
state that dies with the worker. Here the same state is a small, explicit,
serializable object: feed one window's (token → document-frequency) table
at a time (windows must arrive in order — the reference windows by arrival
time and ignores late data, SURVEY §2.7), get candidate events back, and
checkpoint/restore the snapshot FIFO between crawl rounds or process
restarts. The per-window tables are tiny (tokens × N windows), so the
whole state fits the round checkpoint next to the frontier shards.
"""

from __future__ import annotations

import json

import pandas as pd

from ..functions.vocabulary import candidate_events, idf


class VocabTracker:
    def __init__(self, windows: int = 5):
        self.windows = windows
        self.snapshots: list[pd.Series] = []  # oldest → newest per-window IDF
        self.last_window: int | None = None

    def feed(self, window: int, df_counts: dict[str, int], n_docs: int) -> list[str]:
        """Add one completed window (in order); returns candidate events for
        this window ([] until the FIFO is full — EventDetectionBolt only
        fires once ``windows`` snapshots exist)."""
        if self.last_window is not None and window <= self.last_window:
            raise ValueError(
                f"windows must be fed in increasing order "
                f"(got {window} after {self.last_window})"
            )
        self.last_window = window
        snap = idf(pd.Series(df_counts, dtype="float64"), n_docs)
        self.snapshots.append(snap)
        if len(self.snapshots) > self.windows:
            self.snapshots.pop(0)
        if len(self.snapshots) < self.windows:
            return []
        return candidate_events(self.snapshots)

    # -- checkpoint -------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "windows": self.windows,
                "last_window": self.last_window,
                "snapshots": [
                    {k: float(v) for k, v in s.items()} for s in self.snapshots
                ],
            }
        )

    @classmethod
    def from_json(cls, data: str) -> "VocabTracker":
        d = json.loads(data)
        t = cls(windows=d["windows"])
        t.last_window = d["last_window"]
        t.snapshots = [pd.Series(s, dtype="float64") for s in d["snapshots"]]
        return t
