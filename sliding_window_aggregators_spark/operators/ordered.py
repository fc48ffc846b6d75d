"""Out-of-order ordered aggregate state — the FiBA-equivalent kernel.

The reference's finger B-tree aggregator (cpp/src/FiBA.hpp:42-1993) keeps
an ordered map ts → Partial with cached partial aggregates so that
out-of-order ``insert(t, v)``, targeted ``evict(t)``, prefix
``bulkEvict(t)``, sorted ``bulkInsert``, O(1) ``query()`` and
``rangeQuery(t0, t1)`` all stay sub-linear.

In a Spark micro-batch engine every mutation is already a *bulk* op, so
this state re-expresses the same surface over sorted NumPy arrays:

- ``bulk_insert`` ≡ FiBA bulkInsert (FiBA.hpp:1866-1918): one
  ``np.searchsorted`` multisearch + one merge of the sorted batch —
  duplicates merged with ``combine`` in arrival order (FiBA.hpp:1840
  combines in place; duplicate semantics tested by cpp/src/test.cc:442-474
  and cpp/src/bulk_test.cc:320-325).
- ``bulk_evict`` ≡ FiBA bulkEvict (FiBA.hpp:1746-1835): evicts every
  entry with ts ≤ t (bulk_test.cc:249-294 asserts survivors are exactly
  (minTime, maxTime]); here a binary search + O(1) slice view.
- ``query`` ≡ FiBA query via cached spine aggregates (FiBA.hpp:1935-51):
  cached fold of the whole window, recomputed lazily per mutated batch.
- ``range_query(t0, t1)`` — INCLUSIVE of both endpoints
  (semantics pinned by cpp/src/test.cc:618-647) — answered from a
  FlatFAT-style tree of partials (one vectorized combine per level,
  rebuilt lazily after mutations), O(log n) per query. One state thus
  serves *many* window sizes — the reference's window-sharing mode
  (rangeQuery/twin benches, cpp/src/benchmark_core.h:472-562).
"""

from __future__ import annotations

import numpy as np

from ..functions.monoids import (
    Monoid,
    Partial,
    p_concat,
    p_len,
    p_slice,
    p_take,
)
from .kernels import FlatTree


class OrderedAggState:
    """Per-key ordered (ts → Partial) state with bulk mutation + range folds."""

    def __init__(self, monoid: Monoid, ts_dtype=np.int64):
        self.m = monoid
        self.ts = np.empty(0, dtype=ts_dtype)
        self.partials: Partial = monoid.identity(0)
        self._tree: FlatTree | None = None
        self._query_cache: Partial | None = None

    # ------------------------------------------------------------------
    def size(self) -> int:
        return len(self.ts)

    def oldest(self):
        return self.ts[0] if len(self.ts) else None

    def youngest(self):
        return self.ts[-1] if len(self.ts) else None

    def _invalidate(self) -> None:
        self._tree = None
        self._query_cache = None

    # ------------------------------------------------------------------
    def bulk_insert(self, ts: np.ndarray, partials: Partial) -> None:
        """Merge a batch (any order; duplicates allowed — combined in
        arrival order after existing entries, matching FiBA's
        combine-in-place for an existing timestamp, FiBA.hpp:1837-1849)."""
        ts = np.asarray(ts, dtype=self.ts.dtype)
        if len(ts) == 0:
            return
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        partials = p_take(partials, order)

        # in-order fast path (the common case FiBA's fingers optimize,
        # FiBA.hpp:1038-1066): batch strictly newer than everything held →
        # pure append, no merge
        if (
            len(self.ts) == 0 or ts[0] > self.ts[-1]
        ) and (len(ts) == 1 or (ts[1:] > ts[:-1]).all()):
            self.ts = np.concatenate([self.ts, ts])
            self.partials = p_concat(self.partials, partials)
            self._invalidate()
            return

        all_ts = np.concatenate([self.ts, ts])
        # stable sort keeps existing entries before new ones at equal ts,
        # and new ones in arrival order
        order = np.argsort(all_ts, kind="stable")
        all_ts = all_ts[order]
        allp = p_take(p_concat(self.partials, partials), order)

        uniq, first_idx = np.unique(all_ts, return_index=True)
        if len(uniq) == len(all_ts):
            self.ts, self.partials = all_ts, allp
        else:
            merged = p_take(allp, first_idx)
            boundaries = np.append(first_idx, len(all_ts))
            # combine duplicate runs (rare path): fold each run in order
            for u in np.nonzero(np.diff(boundaries) > 1)[0]:
                lo, hi = boundaries[u], boundaries[u + 1]
                acc = p_slice(allp, lo, lo + 1)
                for j in range(lo + 1, hi):
                    acc = self.m.combine(acc, p_slice(allp, j, j + 1))
                for k in merged:
                    merged[k][u] = acc[k][0]
            self.ts, self.partials = uniq, merged
        self._invalidate()

    def insert(self, t, partial: Partial) -> None:
        self.bulk_insert(np.asarray([t]), partial)

    # ------------------------------------------------------------------
    def bulk_evict(self, t) -> int:
        """Evict every entry with ts ≤ t; returns the evicted count."""
        cut = int(np.searchsorted(self.ts, t, side="right"))
        if cut:
            self.ts = self.ts[cut:]
            self.partials = p_slice(self.partials, cut, None)
            self._invalidate()
        return cut

    def evict_oldest(self) -> None:
        if len(self.ts):
            self.ts = self.ts[1:]
            self.partials = p_slice(self.partials, 1, None)
            self._invalidate()

    def evict(self, t) -> bool:
        """Targeted single-timestamp eviction (FiBA evict(t),
        FiBA.hpp:1691-1743)."""
        i = int(np.searchsorted(self.ts, t, side="left"))
        if i < len(self.ts) and self.ts[i] == t:
            self.ts = np.delete(self.ts, i)
            self.partials = {k: np.delete(v, i, axis=0) for k, v in self.partials.items()}
            self._invalidate()
            return True
        return False

    # ------------------------------------------------------------------
    def at(self, t) -> Partial | None:
        """Partial stored at exactly t (FiBA at(), FiBA.hpp:1661)."""
        i = int(np.searchsorted(self.ts, t, side="left"))
        if i < len(self.ts) and self.ts[i] == t:
            return p_slice(self.partials, i, i + 1)
        return None

    def query_partial(self) -> Partial:
        if self._query_cache is None:
            self._query_cache = self.m.reduce(self.partials)
        return self._query_cache

    def query(self):
        return self.m.lower1(self.query_partial())

    def _ensure_tree(self) -> FlatTree:
        if self._tree is None:
            self._tree = FlatTree(self.m, self.partials)
        return self._tree

    def range_query_partial(self, t0, t1) -> Partial:
        """Fold over entries with t0 ≤ ts ≤ t1 (inclusive both ends,
        test.cc:618-647)."""
        lo = int(np.searchsorted(self.ts, t0, side="left"))
        hi = int(np.searchsorted(self.ts, t1, side="right"))
        if hi <= lo:
            return self.m.identity(1)
        return self._ensure_tree().range_fold(lo, hi)

    def range_query(self, t0, t1):
        return self.m.lower1(self.range_query_partial(t0, t1))

    def range_queries(self, t0s: np.ndarray, t1s: np.ndarray) -> Partial:
        """Batched inclusive range folds (window sharing: one state, many
        windows — SURVEY.md §4)."""
        los = np.searchsorted(self.ts, t0s, side="left")
        his = np.searchsorted(self.ts, t1s, side="right")
        tree = self._ensure_tree()
        outs = [
            tree.range_fold(int(lo), int(hi)) if hi > lo else self.m.identity(1)
            for lo, hi in zip(los, his)
        ]
        return p_concat(*outs) if outs else self.m.identity(0)

    # ------------------------------------------------------------------
    # serialization for the streaming state store (Arrow-friendly blobs)
    def dumps(self) -> bytes:
        import pickle

        return pickle.dumps(
            {"ts": self.ts, "partials": self.partials, "v": 1},
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    @classmethod
    def loads(cls, blob: bytes, monoid: Monoid) -> "OrderedAggState":
        import pickle

        d = pickle.loads(blob)
        st = cls(monoid, ts_dtype=d["ts"].dtype)
        st.ts = d["ts"]
        st.partials = d["partials"]
        return st
