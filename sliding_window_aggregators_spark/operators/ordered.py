"""Out-of-order ordered aggregate state — the FiBA-equivalent kernel.

The reference's finger B-tree aggregator (cpp/src/FiBA.hpp:42-1993) keeps
an ordered map ts → Partial with cached partial aggregates so that
out-of-order ``insert(t, v)``, targeted ``evict(t)``, prefix
``bulkEvict(t)``, sorted ``bulkInsert``, O(1) ``query()`` and
``rangeQuery(t0, t1)`` all stay sub-linear.

In a Spark micro-batch engine every mutation is already a *bulk* op, so
this state re-expresses the same surface over sorted NumPy arrays backed
by an INCREMENTALLY MAINTAINED implicit segment tree (the array analogue
of FiBA's spine repair, cpp/src/FiBA.hpp:930-992):

- ``bulk_insert`` ≡ FiBA bulkInsert (FiBA.hpp:1866-1918): a batch landing
  d behind the tip touches only the displaced suffix — one suffix merge
  plus an ancestor repair of the touched leaf span, O(d + k + log C)
  combines (NOT O(n) rebuild). The in-order case is a pure append with an
  O(k + log C) repair — the finger fast path (FiBA.hpp:1038-1066).
- ``bulk_evict`` ≡ FiBA bulkEvict (FiBA.hpp:1746-1835): evicts every
  entry with ts ≤ t (bulk_test.cc:249-294 asserts survivors are exactly
  (minTime, maxTime]); here it just advances the logical start offset —
  ZERO combines, because range folds only ever decompose into tree nodes
  fully inside the live span, so stale nodes left of the offset are never
  read. Space is reclaimed by the amortized compaction in ``_grow``.
- ``query`` ≡ FiBA query via cached root-path aggregates
  (FiBA.hpp:1935-51): an O(log n) fold over the live span, cached.
- ``range_query(t0, t1)`` — INCLUSIVE of both endpoints (semantics
  pinned by cpp/src/test.cc:618-647) — canonical segment-tree
  decomposition, O(log n) per query with NO rebuild after mutations.
  One state thus serves *many* window sizes — the reference's
  window-sharing mode (rangeQuery/twin benches,
  cpp/src/benchmark_core.h:472-562).

Non-commutative monoids are safe throughout: level repair combines
left-child-then-right-child (physical order == time order), and the fold
assembles left fragments forward and right fragments backward, exactly
like the FlatFAT walk.
"""

from __future__ import annotations

import numpy as np

from ..functions.monoids import (
    Monoid,
    Partial,
    p_concat,
    p_copy,
    p_len,
    p_slice,
    p_take,
)


class OrderedAggState:
    """Per-key ordered (ts → Partial) state with bulk mutation + range folds.

    Physical layout: ``_tsbuf``/``_levels[0]`` are capacity-sized buffers
    (capacity a power of two); the live window is ``[_lo, _lo + _n)``.
    ``_levels[k]`` holds the segment-tree level of 2^k-span nodes; only
    ancestors of mutated leaves are recomputed (vectorized per level)."""

    def __init__(self, monoid: Monoid, ts_dtype=np.int64):
        self.m = monoid
        self._ts_dtype = np.dtype(ts_dtype)
        self._cap = 0
        self._tsbuf = np.empty(0, dtype=self._ts_dtype)
        self._levels: list[Partial] = []
        self._lo = 0
        self._n = 0
        self._query_cache: Partial | None = None
        # LAZY spine repair: mutations only widen this physical dirty leaf
        # span; ancestors are recomputed once, on the first fold after a
        # mutation burst (append-heavy streams that never range-query pay
        # zero tree maintenance — matching FiBA, whose repair work rides
        # the mutation's root path only when aggregates are consulted)
        self._dirty: tuple[int, int] | None = None

    # ------------------------------------------------------------------
    # live-window views (zero-copy)

    @property
    def ts(self) -> np.ndarray:
        return self._tsbuf[self._lo : self._lo + self._n]

    @property
    def partials(self) -> Partial:
        if not self._levels:
            return self.m.identity(0)
        return p_slice(self._levels[0], self._lo, self._lo + self._n)

    def size(self) -> int:
        return self._n

    def oldest(self):
        return self.ts[0] if self._n else None

    def youngest(self):
        return self.ts[-1] if self._n else None

    # ------------------------------------------------------------------
    # tree maintenance

    def _alloc(self, cap: int) -> None:
        self._cap = cap
        self._tsbuf = np.empty(cap, dtype=self._ts_dtype)
        self._levels = []
        c = cap
        while True:
            self._levels.append(self.m.identity(c))
            if c == 1:
                break
            c >>= 1

    def _repair(self, a: int, b: int) -> None:
        """Recompute ancestors of physical leaves [a, b) — O(b−a + log C)
        combines, vectorized per level (the spine repair)."""
        if b <= a:
            return
        for lvl in range(1, len(self._levels)):
            child = self._levels[lvl - 1]
            pa, pb = a >> 1, ((b - 1) >> 1) + 1
            left = {k: v[2 * pa : 2 * pb : 2] for k, v in child.items()}
            right = {k: v[2 * pa + 1 : 2 * pb + 1 : 2] for k, v in child.items()}
            res = self.m.combine(left, right)
            parent = self._levels[lvl]
            for k in parent:
                parent[k][pa:pb] = res[k]
            a, b = pa, pb

    def _mark_dirty(self, a: int, b: int) -> None:
        if b <= a:
            return
        if self._dirty is None:
            self._dirty = (a, b)
        else:
            self._dirty = (min(self._dirty[0], a), max(self._dirty[1], b))

    def _flush_repairs(self) -> None:
        if self._dirty is not None:
            if self._n:
                # clamp to the live window: ancestors of already-evicted
                # leaves are never decomposed into by folds, so repairing
                # them after a large bulk_evict would be pure waste (an
                # O(evicted) latency spike on the first query)
                a = max(self._dirty[0], self._lo)
                b = min(self._dirty[1], self._lo + self._n)
                self._repair(a, b)
            self._dirty = None

    def _write(self, at: int, ts_vals: np.ndarray, parts: Partial) -> None:
        n = len(ts_vals)
        self._tsbuf[at : at + n] = ts_vals
        leaves = self._levels[0]
        for k in leaves:
            leaves[k][at : at + n] = parts[k]

    def _grow(self, prefix_len: int, tail_ts: np.ndarray, tail_p: Partial) -> None:
        """Re-seat the state as prefix (first ``prefix_len`` live entries)
        + tail into a fresh (or compacted) buffer — amortized O(1)/element:
        triggered only when the physical end hits capacity, which requires
        ≥ cap/2 appended-or-evicted slots since the previous re-seat."""
        keep_ts = np.ascontiguousarray(self.ts[:prefix_len])
        keep_p = p_take(self.partials, slice(0, prefix_len)) if prefix_len else None
        n_new = prefix_len + len(tail_ts)
        cap = 16
        while cap < 2 * n_new:
            cap <<= 1
        self._alloc(cap)
        self._lo = 0
        self._n = n_new
        if prefix_len:
            self._write(0, keep_ts, {k: np.ascontiguousarray(v) for k, v in keep_p.items()})
        if len(tail_ts):
            self._write(prefix_len, tail_ts, tail_p)
        self._dirty = None  # old physical coordinates are void after re-seat
        self._mark_dirty(0, n_new)

    def _range_fold(self, lo: int, hi: int) -> Partial:
        """Order-preserving fold of physical leaves [lo, hi)."""
        m = self.m
        if hi <= lo:
            return m.identity(1)
        self._flush_repairs()
        left_parts: list[Partial] = []
        right_parts: list[Partial] = []
        lvl = 0
        while lo < hi and lvl < len(self._levels):
            cur = self._levels[lvl]
            if lo & 1:
                left_parts.append(p_slice(cur, lo, lo + 1))
                lo += 1
            if hi & 1:
                hi -= 1
                right_parts.append(p_slice(cur, hi, hi + 1))
            lo >>= 1
            hi >>= 1
            lvl += 1
        acc = m.identity(1)
        for part in left_parts:
            acc = m.combine(acc, part)
        for part in reversed(right_parts):
            acc = m.combine(acc, part)
        return acc

    # ------------------------------------------------------------------
    def _merge_runs(self, ts_a, p_a, ts_b, p_b):
        """Merge two sorted runs; duplicates combined in order (existing
        first — FiBA combines in place at an existing timestamp,
        FiBA.hpp:1837-1849; duplicate semantics tested by
        cpp/src/test.cc:442-474 and cpp/src/bulk_test.cc:320-325)."""
        all_ts = np.concatenate([ts_a, ts_b])
        order = np.argsort(all_ts, kind="stable")
        all_ts = all_ts[order]
        allp = p_take(p_concat(p_a, p_b) if p_len(p_a) else p_b, order)
        uniq, first_idx = np.unique(all_ts, return_index=True)
        if len(uniq) == len(all_ts):
            return all_ts, allp
        # vectorized duplicate collapse: left-fold each group with one
        # combine PER GROUP DEPTH (all groups advanced in lockstep), not
        # one Python-level combine per duplicate element — a batch fully
        # overlapping a w/4 suffix used to pay a 16k-iteration Python
        # loop here (the r02 ooo-bench d=w/4 regression); now it pays
        # max_group_size−1 vectorized combines (2 runs in, so usually 1)
        merged = p_take(allp, first_idx)
        sizes = np.diff(np.append(first_idx, len(all_ts)))
        for j in range(1, int(sizes.max())):
            sel = np.nonzero(sizes > j)[0]
            nxt = self.m.combine(
                p_take(merged, sel), p_take(allp, first_idx[sel] + j)
            )
            for k in merged:
                merged[k][sel] = nxt[k]
        return uniq, merged

    def bulk_insert(self, ts: np.ndarray, partials: Partial) -> None:
        """Merge a batch (any order; duplicates allowed). Cost is
        O(k + d + log C) combines where d = how far the oldest batch entry
        lands behind the tip — the FiBA bulkInsert bound, not O(n)."""
        ts = np.asarray(ts, dtype=self._ts_dtype)
        if len(ts) == 0:
            return
        if len(ts) > 1 and not bool((ts[1:] >= ts[:-1]).all()):
            # only unsorted batches pay the argsort + full partial copy;
            # the hot streaming path pre-sorts each micro-batch, making
            # already-sorted the common case
            order = np.argsort(ts, kind="stable")
            ts = ts[order]
            partials = p_take(partials, order)
        self._query_cache = None

        strictly_inc = len(ts) == 1 or bool((ts[1:] > ts[:-1]).all())
        end = self._lo + self._n
        if (self._n == 0 or ts[0] > self._tsbuf[end - 1]) and strictly_inc:
            # in-order fast path: pure append + ancestor repair
            if end + len(ts) > self._cap:
                self._grow(self._n, ts, partials)
                return
            self._write(end, ts, partials)
            self._n += len(ts)
            self._mark_dirty(end, end + len(ts))
            return

        # OOO path: only the displaced suffix is re-merged
        pos = int(np.searchsorted(self.ts, ts[0], side="left"))
        suf_ts = np.ascontiguousarray(self.ts[pos:])
        suf_p = p_take(self.partials, slice(pos, self._n))
        merged_ts, merged_p = self._merge_runs(suf_ts, suf_p, ts, partials)
        write_at = self._lo + pos
        if write_at + len(merged_ts) > self._cap:
            self._grow(pos, merged_ts, merged_p)
            return
        self._write(write_at, merged_ts, merged_p)
        self._n = pos + len(merged_ts)
        self._mark_dirty(write_at, write_at + len(merged_ts))

    def insert(self, t, partial: Partial) -> None:
        self.bulk_insert(np.asarray([t]), partial)

    # ------------------------------------------------------------------
    def bulk_evict(self, t) -> int:
        """Evict every entry with ts ≤ t; returns the evicted count.
        O(log n) search + offset advance — no tree repair (stale nodes
        left of the offset are never decomposed into by range folds)."""
        cut = int(np.searchsorted(self.ts, t, side="right"))
        if cut:
            self._lo += cut
            self._n -= cut
            if self._n == 0:
                self._lo = 0
                self._dirty = None
            self._query_cache = None
        return cut

    def evict_oldest(self) -> None:
        if self._n:
            self._lo += 1
            self._n -= 1
            if self._n == 0:
                self._lo = 0
                self._dirty = None
            self._query_cache = None

    def evict(self, t) -> bool:
        """Targeted single-timestamp eviction (FiBA evict(t),
        FiBA.hpp:1691-1743): shift the suffix left one slot and repair its
        ancestors — O(n − i + log C), vectorized."""
        i = int(np.searchsorted(self.ts, t, side="left"))
        if i >= self._n or self.ts[i] != t:
            return False
        phys = self._lo + i
        end = self._lo + self._n
        self._tsbuf[phys : end - 1] = self._tsbuf[phys + 1 : end]
        leaves = self._levels[0]
        for k in leaves:
            leaves[k][phys : end - 1] = leaves[k][phys + 1 : end]
        self._n -= 1
        if self._n == 0:
            self._lo = 0
            self._dirty = None
        else:
            self._mark_dirty(phys, self._lo + self._n)
        self._query_cache = None
        return True

    # ------------------------------------------------------------------
    def at(self, t) -> Partial | None:
        """Partial stored at exactly t (FiBA at(), FiBA.hpp:1661).
        Returns a detached COPY — a snapshot, not a live view (a view
        would silently track later combines at t, then freeze to a stale
        buffer whenever _grow re-seats the arrays)."""
        i = int(np.searchsorted(self.ts, t, side="left"))
        if i < self._n and self.ts[i] == t:
            return p_copy(p_take(self.partials, slice(i, i + 1)))
        return None

    def query_partial(self) -> Partial:
        """Fold over the whole live window. Returns a detached COPY so a
        caller mutating the result (e.g. in-place combine arithmetic)
        cannot poison the internal query cache."""
        if self._query_cache is None:
            self._query_cache = self._range_fold(self._lo, self._lo + self._n)
        return p_copy(self._query_cache)

    def query(self):
        return self.m.lower1(self.query_partial())

    def range_query_partial(self, t0, t1) -> Partial:
        """Fold over entries with t0 ≤ ts ≤ t1 (inclusive both ends,
        test.cc:618-647)."""
        lo = int(np.searchsorted(self.ts, t0, side="left"))
        hi = int(np.searchsorted(self.ts, t1, side="right"))
        return self._range_fold(self._lo + lo, self._lo + hi)

    def range_query(self, t0, t1):
        return self.m.lower1(self.range_query_partial(t0, t1))

    def range_queries(self, t0s: np.ndarray, t1s: np.ndarray) -> Partial:
        """Batched inclusive range folds (window sharing: one state, many
        windows — SURVEY.md §4).

        Large batches (the per-turn query pattern: q ≈ n) go through
        :func:`~.kernels.interval_fold` over the live leaf window —
        prefix-diff / sparse-table / disjoint-sparse-table by monoid
        trait, O(log n) vectorized combines total instead of a scalar
        O(log n) tree walk PER QUERY. Small batches keep the walk: the
        incrementally-maintained internal levels answer them with zero
        build cost."""
        los = np.searchsorted(self.ts, t0s, side="left")
        his = np.searchsorted(self.ts, t1s, side="right")
        if len(los) >= 64 and getattr(self.m, "scan2d", True):
            from .kernels import interval_fold

            # leaves are always current (repairs only touch internal
            # levels), so no _flush_repairs here
            return interval_fold(self.m, self.partials, los, his)
        outs = [
            self._range_fold(int(lo) + self._lo, int(hi) + self._lo)
            for lo, hi in zip(los, his)
        ]
        return p_concat(*outs) if outs else self.m.identity(0)

    # ------------------------------------------------------------------
    # serialization for the streaming state store (Arrow-friendly blobs)
    def dumps(self) -> bytes:
        import pickle

        return pickle.dumps(
            {
                "ts": np.ascontiguousarray(self.ts),
                "partials": {k: np.ascontiguousarray(v) for k, v in self.partials.items()},
                "v": 1,
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    @classmethod
    def loads(cls, blob: bytes, monoid: Monoid) -> "OrderedAggState":
        import pickle

        d = pickle.loads(blob)
        if d.get("v") != 1:
            raise ValueError(f"unsupported OrderedAggState state version: {d.get('v')}")
        # the version tag alone can't catch a monoid/config change between
        # job runs; mismatched partial schemas would otherwise corrupt
        # silently (float state truncated into an int monoid) or die deep
        # inside _write with an opaque KeyError
        ident = monoid.identity(1)
        if set(d["partials"]) != set(ident):
            raise ValueError(
                f"state/monoid mismatch: stored partial fields "
                f"{sorted(d['partials'])} != {monoid.name!r} fields {sorted(ident)}"
            )
        for k, v in d["partials"].items():
            if v.dtype != ident[k].dtype:
                raise ValueError(
                    f"state/monoid dtype mismatch on field {k!r}: stored "
                    f"{v.dtype} != {monoid.name!r} {ident[k].dtype}"
                )
        st = cls(monoid, ts_dtype=d["ts"].dtype)
        if len(d["ts"]):
            st._grow(0, d["ts"], d["partials"])
        return st
