"""Vectorized sliding-window kernels — the engine's physical operators.

These are the Spark-first re-expressions of the reference's
window-maintenance algorithms (SURVEY.md §2.B). The unit of work is a
*batch* (an Arrow/pandas chunk inside ``applyInPandas`` /
``applyInPandasWithState``), so every kernel is bulk-first: the
reference's per-element ``insert``/``evict``/``query``
(cpp/src/TwoStacksLite.hpp:35-64) becomes a handful of NumPy
``ufunc.accumulate`` scans per batch.

Kernels:

- :func:`sliding_reduce` — one-shot block-decomposed two-stacks over a
  whole array (the classic "suffix-scan per block ⊕ prefix-scan per
  block" trick; the vectorized form of the flip in
  cpp/src/ImplicitTwoStacksLite.hpp:60-77).
- :class:`TwoStacksKernel` — *persistent* vectorized Two-Stacks Lite
  (cpp/src/TwoStacksLite.hpp:23-77): amortized O(1)/row across
  micro-batches even when the window is much larger than the batch.
- :class:`SubtractOnEvictKernel` — O(1)/row running total for invertible
  monoids (cpp/src/SubtractOnEvict.hpp:20-64).
- :class:`SlidingCountWindow` — strategy dispatcher (block vs persistent
  two-stacks vs SOE).
- :func:`interval_fold` — per-row variable-bound range folds (time-based
  windows): prefix-difference for groups, overlapping sparse table for
  idempotent monoids, tree walk otherwise.
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
    p_where,
)

# ---------------------------------------------------------------------------
# Block-decomposed one-shot sliding reduce (stateless)
# ---------------------------------------------------------------------------


def sliding_partials(monoid: Monoid, p: Partial, w: int) -> Partial:
    """Partial batch → sliding-window partials: out_i = fold of the last
    min(i+1, w) partials, in stream order.

    Block decomposition: split into blocks of w; S = per-block suffix scan,
    F = per-block prefix scan; a window [s, i] spans ≤ 2 blocks, so
    out_i = S[s] ⊕ F[i] (or just F[i] when s and i share a block).
    O(n) total with two vectorized scans — no per-row Python.
    """
    n = p_len(p)
    if n == 0:
        return p
    if w <= 1:
        return p
    if w <= getattr(monoid, "doubling_threshold", 32):
        # log-doubling fast path: the block decomposition below costs
        # ~7 full-array materializations (pad concat, two scans with a
        # flip copy, two gathers, combine, where) — pure memory traffic
        # that dominates for vector partials (bloom/hll/histq/cms carry
        # 256-512 bytes/row). Doubling needs only ceil(log2 w) shifted
        # combines to build power-of-2 spans plus popcount(w)-1 to
        # compose them: w=4 -> 2 combines, w=32 -> 5. shift(q, k)_i =
        # q_{i-k} (identity for i<k), so span-s aggregates clamp at the
        # stream head exactly like the scan path. Combine order is
        # (older, newer) throughout — non-commutative monoids (Collect,
        # ArgMax's >= tie-break) depend on it. Interleaved same-process
        # A/B (window-immune): sum w4 x5.8, bloom w4 x3.2, hll w4 x27.8;
        # still >= x1.3 for every registry monoid at w=32, crossover
        # ~w64 for bloom/geomean (hll/sum keep winning past w256, but
        # the uniform w<=32 rule is the one that regresses nothing).
        def shift(q: Partial, k: int) -> Partial:
            if k >= n:
                return monoid.identity(n)
            return p_concat(monoid.identity(k), p_slice(q, 0, n - k))

        spans = {1: p}
        s = 1
        while s * 2 <= w:
            spans[s * 2] = monoid.combine(shift(spans[s], s), spans[s])
            s *= 2
        out = spans[s]
        covered = s
        while covered < w:
            t = 1 << ((w - covered).bit_length() - 1)
            out = monoid.combine(shift(spans[t], covered), out)
            covered += t
        return out
    nblocks = -(-n // w)
    pad = nblocks * w - n
    padded = p_concat(p, monoid.identity(pad)) if pad else p
    blocked = {k: v.reshape((nblocks, w) + v.shape[1:]) for k, v in padded.items()}
    F = monoid.accumulate(blocked, axis=1)
    S = monoid.raccumulate(blocked, axis=1)
    F = {k: v.reshape((nblocks * w,) + v.shape[2:]) for k, v in F.items()}
    S = {k: v.reshape((nblocks * w,) + v.shape[2:]) for k, v in S.items()}

    i = np.arange(n)
    s = np.maximum(0, i - w + 1)
    same_block = (s // w) == (i // w)
    # F already is out_i for same-block windows: truncate the pad with a
    # view instead of gathering a full identity-index copy
    Fi = p_slice(F, 0, n)
    if bool(same_block.all()):
        return Fi
    combined = monoid.combine(p_take(S, s), Fi)
    return p_where(same_block, Fi, combined)


def sliding_reduce(monoid: Monoid, values: np.ndarray, w: int) -> np.ndarray:
    """Lowered sliding-window aggregate over raw values (batch one-shot)."""
    return monoid.lower(sliding_partials(monoid, monoid.lift(values), w))


# ---------------------------------------------------------------------------
# Persistent vectorized Two-Stacks Lite
# ---------------------------------------------------------------------------


class TwoStacksKernel:
    """Persistent Two-Stacks Lite over NumPy arrays, bulk-driven.

    State (the vectorized analogue of cpp/src/TwoStacksLite.hpp:29-33):

    - ``front_vals`` — raw partials of the flipped segment, time order.
    - ``front_agg``  — suffix aggregates: front_agg[k] = vals[k] ⊕ … ⊕
      vals[L-1] (what each front-stack entry caches, TwoStacksLite.hpp:49).
    - ``front_pos``  — index of the current oldest (evict = += 1).
    - ``back``       — list of partial chunks appended since last flip.
    - ``back_sum``   — length-1 partial: fold of all back chunks
      (``_backSum``, TwoStacksLite.hpp:38).

    ``push_bulk(P)`` implements, per incoming partial: *if size == w:
    evict-oldest; insert; emit query()* — the steady-state tick of
    cpp/src/benchmark_core.h:111-117 — processing whole spans between
    flips with vectorized gathers (≈ m/w + 2 Python iterations/batch).
    """

    def __init__(self, monoid: Monoid, w: int):
        assert w >= 1
        self.m = monoid
        self.w = w
        self.front_vals: Partial | None = None
        self.front_agg: Partial | None = None
        self.front_pos = 0
        self.back: list[Partial] = []
        self.back_len = 0
        self.back_sum: Partial = monoid.identity(1)

    @property
    def size(self) -> int:
        f = 0 if self.front_vals is None else p_len(self.front_vals) - self.front_pos
        return f + self.back_len

    def _flip(self) -> None:
        chunks = self.back
        if self.front_vals is not None and self.front_pos < p_len(self.front_vals):
            raise AssertionError("flip with non-empty front")
        vals = p_concat(*chunks) if len(chunks) > 1 else chunks[0]
        self.front_vals = vals
        self.front_agg = self.m.raccumulate(vals, axis=0)
        self.front_pos = 0
        self.back = []
        self.back_len = 0
        self.back_sum = self.m.identity(1)

    def _front_total(self) -> Partial:
        """Fold of the whole remaining front (identity when empty)."""
        if self.front_vals is None or self.front_pos >= p_len(self.front_vals):
            return self.m.identity(1)
        return p_take(self.front_agg, slice(self.front_pos, self.front_pos + 1))

    def query_partial(self) -> Partial:
        return self.m.combine(self._front_total(), self.back_sum)

    def push_bulk(self, p: Partial) -> Partial:
        """Per row: evict-if-full, insert, query. Returns per-row partials."""
        m, w = self.m, self.w
        n = p_len(p)
        if n == 0:
            return p
        outs: list[Partial] = []
        j = 0
        while j < n:
            remaining = n - j
            if self.size < w:
                # growing phase: no evictions until the window fills
                take = min(remaining, w - self.size)
                chunk = p_slice(p, j, j + take)
                acc = m.accumulate(chunk, axis=0)
                run = m.combine(
                    {k: np.broadcast_to(v, acc[k].shape) for k, v in self.back_sum.items()},
                    acc,
                )
                front_tot = self._front_total()
                outs.append(
                    m.combine(
                        {k: np.broadcast_to(v, run[k].shape) for k, v in front_tot.items()},
                        run,
                    )
                )
                self.back.append(chunk)
                self.back_len += take
                self.back_sum = p_take(run, slice(take - 1, take))
                j += take
                continue
            # steady state: each row evicts one from the front
            front_avail = (
                0 if self.front_vals is None else p_len(self.front_vals) - self.front_pos
            )
            if front_avail == 0:
                self._flip()
                continue
            take = min(remaining, front_avail)
            chunk = p_slice(p, j, j + take)
            acc = m.accumulate(chunk, axis=0)
            run = m.combine(
                {k: np.broadcast_to(v, acc[k].shape) for k, v in self.back_sum.items()},
                acc,
            )
            # after k+1 evictions the front contributes front_agg[pos+k+1]
            lo = self.front_pos + 1
            idx = np.arange(lo, lo + take)
            L = p_len(self.front_vals)
            valid = idx < L
            idx_c = np.minimum(idx, L - 1)
            fa = p_take(self.front_agg, idx_c)
            ident = self.m.identity(take)
            fa = p_where(valid, fa, ident)
            outs.append(m.combine(fa, run))
            self.front_pos += take
            self.back.append(chunk)
            self.back_len += take
            self.back_sum = p_take(run, slice(take - 1, take))
            j += take
        return outs[0] if len(outs) == 1 else p_concat(*outs)


# ---------------------------------------------------------------------------
# SubtractOnEvict (invertible fast path)
# ---------------------------------------------------------------------------


class SubtractOnEvictKernel:
    """O(1)/row sliding window for invertible monoids — running total plus a
    ring buffer of the live window (cpp/src/SubtractOnEvict.hpp:20-64;
    the Rust type-level guard is rust/tests/trybuild_soe_max.fail).
    """

    def __init__(self, monoid: Monoid, w: int):
        if not monoid.invertible:
            raise TypeError(
                f"SubtractOnEvict requires an invertible monoid, got {monoid.name}"
            )
        self.m = monoid
        self.w = w
        # the O(w) ring is allocated LAZILY: until the window first fills no
        # eviction can happen, so a list of pending chunks suffices — keys
        # whose streams never reach w rows (most conversations) never pay
        # the O(w) allocation
        self.ring: Partial | None = None
        self.pending: list[Partial] = []
        self.head = 0  # next slot to evict/overwrite
        self.size = 0
        self.total: Partial = monoid.identity(1)

    def _grow_phase(self, p: Partial) -> tuple[Partial, Partial | None]:
        """Handle rows while size < w without a ring. Returns (per-row
        outputs for the consumed prefix, remaining suffix of ``p`` to
        process in ring mode — None if fully consumed)."""
        m, w = self.m, self.w
        n = p_len(p)
        take = min(n, w - self.size)
        chunk = p_slice(p, 0, take)
        acc = m.accumulate(chunk, axis=0)
        out = m.combine(
            {k: np.broadcast_to(v, acc[k].shape) for k, v in self.total.items()}, acc
        )
        self.pending.append(chunk)
        self.total = p_take(out, slice(take - 1, take))
        self.size += take
        if self.size == w:
            self.ring = p_concat(*self.pending) if len(self.pending) > 1 else p_copy(
                self.pending[0]
            )
            self.pending = []
            self.head = 0
        return out, (p_slice(p, take, None) if take < n else None)

    def push_bulk(self, p: Partial) -> Partial:
        m, w = self.m, self.w
        n = p_len(p)
        if n == 0:
            return p
        if self.size < w:
            out_grow, rest = self._grow_phase(p)
            if rest is None:
                return out_grow
            return p_concat(out_grow, self.push_bulk(rest))
        # positions each incoming row lands on (and evicts from, when full)
        slots = (self.head + np.arange(n)) % w
        acc_in = m.accumulate(p, axis=0)
        # evicted partials: rows that overwrite a live slot
        evict_mask = (self.size + np.arange(n)) >= w
        evicted = p_take(self.ring, slots)
        # rows overwriting a slot already written THIS batch evict the batch
        # row that wrote it (happens when n > w): that row is i - w
        intra = np.arange(n) - w
        intra_valid = intra >= 0
        if intra_valid.any():
            evicted = p_where(
                intra_valid, p_take(p, np.maximum(intra, 0)), evicted
            )
        ident = m.identity(n)
        evicted = p_where(evict_mask, evicted, ident)
        acc_ev = m.accumulate(evicted, axis=0)
        tot = {k: np.broadcast_to(v, acc_in[k].shape) for k, v in self.total.items()}
        out = m.inverse_combine(m.combine(tot, acc_in), acc_ev)
        # write the batch into the ring (last w rows win)
        keep = np.arange(max(0, n - w), n)
        for k in self.ring:
            self.ring[k][slots[keep]] = p[k][keep]
        self.total = p_take(out, slice(n - 1, n))
        self.size = min(w, self.size + n)
        self.head = int((self.head + n) % w)
        return out


# ---------------------------------------------------------------------------
# Strategy dispatcher
# ---------------------------------------------------------------------------


class SlidingCountWindow:
    """Count-based sliding window over a keyed stream of batches.

    Emits, for every input row, the aggregate of the last ``w`` rows
    (fewer during warm-up) — the reference's FIFO query loop
    (cpp/src/benchmark_core.h:96-121). Strategy:

    - invertible monoid → :class:`SubtractOnEvictKernel` (O(1)/row);
    - ``w`` ≤ 4096 → stateless block kernel over a raw tail
      (O(m + w)/batch, zero Python loops);
    - else → persistent :class:`TwoStacksKernel` (amortized O(1)/row).

    Monoids whose ``accumulate`` cannot run on the block kernel's 2-D
    blocked layout (``scan2d = False``: Collect) always take two-stacks.
    """

    def __init__(self, monoid: Monoid, w: int, strategy: str = "auto"):
        self.m = monoid
        self.w = w
        self.strategy = strategy
        self._impl = None
        self._tail: Partial | None = None  # block strategy state

    def _choose(self) -> str:
        if self.strategy != "auto":
            return self.strategy
        if not getattr(self.m, "scan2d", True):
            # e.g. Collect: accumulate is 1-D-only, so neither SOE's
            # prefix scans nor the blocked 2-D scan apply
            return "twostacks"
        if self.m.invertible and self.m.soe_safe and self.m.name != "collect":
            return "soe"
        # block costs O(m + w) per batch (bad when w ≫ batch); two-stacks is
        # amortized O(1)/row but pays ~1 Python iteration per w rows (bad
        # when w is tiny). Crossover ≈ 4k rows.
        if self.w <= 4096:
            return "block"
        return "twostacks"

    def process(self, values: np.ndarray) -> np.ndarray:
        p = self.m.lift(values)
        return self.m.lower(self.process_partials(p))

    def process_partials(self, p: Partial) -> Partial:
        if self._impl is None:
            strat = self._choose()
            if strat == "soe":
                self._impl = SubtractOnEvictKernel(self.m, self.w)
            elif strat == "twostacks":
                self._impl = TwoStacksKernel(self.m, self.w)
            else:
                self._impl = "block"
                self._tail = self.m.identity(0)
        if self._impl == "block":
            arr = p_concat(self._tail, p) if p_len(self._tail) else p
            out = sliding_partials(self.m, arr, self.w)
            ntail = p_len(self._tail)
            n = p_len(arr)
            keep = max(0, n - (self.w - 1))
            self._tail = p_slice(arr, keep, None)
            return p_slice(out, ntail, None)
        return self._impl.push_bulk(p)

    # --- checkpoint-safe serialization ------------------------------------
    # State is exported as a plain versioned dict of arrays + scalars (like
    # OrderedAggState.dumps), NOT a pickled kernel object: class refactors
    # then can't silently corrupt a streaming checkpoint restore — loads
    # reconstructs fresh kernels from the arrays.

    def state_dict(self) -> dict:
        # every array is COPIED: the SOE ring (and two-stacks chunks) are
        # mutated in place by the next process() call, so returning live
        # references would silently corrupt a snapshot serialized later
        # (deferred/batched state commits)
        def cp(x):
            if x is None:
                return None
            if isinstance(x, dict):
                return p_copy(x)
            if isinstance(x, list):
                return [cp(i) for i in x]
            return x

        d: dict = {"v": 1, "w": self.w, "strategy": self.strategy}
        if self._impl is None:
            d["impl"] = None
        elif self._impl == "block":
            d["impl"] = "block"
            d["tail"] = cp(self._tail)
        elif isinstance(self._impl, SubtractOnEvictKernel):
            k = self._impl
            d["impl"] = "soe"
            d["soe"] = {
                "ring": cp(k.ring), "pending": cp(k.pending), "head": k.head,
                "size": k.size, "total": cp(k.total),
            }
        else:
            k = self._impl
            d["impl"] = "twostacks"
            d["ts"] = {
                "front_vals": cp(k.front_vals), "front_agg": cp(k.front_agg),
                "front_pos": k.front_pos, "back": cp(k.back),
                "back_len": k.back_len, "back_sum": cp(k.back_sum),
            }
        return d

    @classmethod
    def from_state_dict(cls, d: dict, monoid: Monoid) -> "SlidingCountWindow":
        if d.get("v") != 1:
            raise ValueError(f"unsupported SlidingCountWindow state version: {d.get('v')}")
        self = cls(monoid, d["w"], d.get("strategy", "auto"))
        impl = d["impl"]
        if impl == "block":
            self._impl = "block"
            self._tail = d["tail"]
        elif impl == "soe":
            k = SubtractOnEvictKernel(monoid, d["w"])
            s = d["soe"]
            k.ring, k.pending, k.head = s["ring"], s["pending"], s["head"]
            k.size, k.total = s["size"], s["total"]
            self._impl = k
        elif impl == "twostacks":
            k = TwoStacksKernel(monoid, d["w"])
            s = d["ts"]
            k.front_vals, k.front_agg = s["front_vals"], s["front_agg"]
            k.front_pos, k.back = s["front_pos"], s["back"]
            k.back_len, k.back_sum = s["back_len"], s["back_sum"]
            self._impl = k
        return self


# ---------------------------------------------------------------------------
# Variable-bound range folds (time-based windows)
# ---------------------------------------------------------------------------


def _prefix_diff_fold(m: Monoid, p: Partial, starts, ends) -> Partial:
    """Prefix-sum difference for invertible commutative monoids.

    Exactness bound: the scan dtype follows the partial dtype. Integer
    partials (cents-style lifts — sum/count/stddev with an int dtype) are
    EXACT until the cumulative prefix overflows int64 (~3.8e9 rows/key at
    cents² ≈ 2.4e9/row). Float64 partials lose low bits once a key's
    cumulative prefix exceeds 2^53 (~1e8 rows/key at ~1e8/row): correct to
    double rounding, but not bit-identical to an arbitrary-precision
    oracle. Hot keys beyond that at target scale should lift integers
    (int_values=True) or be chunk-split (chunked-halo) so each fold's
    prefix stays short."""
    acc = m.accumulate(p, axis=0)
    nonempty = ends > starts
    hi = p_take(acc, np.maximum(ends - 1, 0))
    hi = p_where(nonempty, hi, m.identity(len(starts)))
    lo_valid = nonempty & (starts > 0)
    lo = p_take(acc, np.maximum(starts - 1, 0))
    lo = p_where(lo_valid, lo, m.identity(len(starts)))
    return m.inverse_combine(hi, lo)


def _sparse_table_fold(m: Monoid, p: Partial, starts, ends) -> Partial:
    """Overlapping range fold — idempotent monoids (commutative or not:
    the two covering intervals overlap, and with idempotent combine the
    left-first fold still returns the correct — for ArgMax, earliest —
    witness). Levels are built only up to the longest queried range."""
    n = p_len(p)
    length = ends - starts
    maxlen = int(length.max()) if len(length) else 1
    levels = [p]
    k = 1
    while (1 << k) <= min(n, maxlen):
        prev = levels[-1]
        half = 1 << (k - 1)
        sz = n - (1 << k) + 1
        levels.append(
            m.combine(p_slice(prev, 0, sz), p_slice(prev, half, half + sz))
        )
        k += 1
    ks = np.floor(np.log2(np.maximum(length, 1))).astype(np.int64)
    out = m.identity(len(starts))
    for kk in range(len(levels)):
        sel = ks == kk
        if not sel.any():
            continue
        half = 1 << kk
        # clamp BOTH gathers: an empty query at the array end has
        # starts == n, which would index out of bounds before the
        # empty-mask below ever applies (the mask overwrites the result,
        # so any in-range index is fine)
        a = p_take(levels[kk], np.minimum(starts[sel], p_len(levels[kk]) - 1))
        b = p_take(levels[kk], np.maximum(ends[sel] - half, 0))
        res = m.combine(a, b)
        for key in out:
            out[key][sel] = res[key]
    empty = length <= 0
    if empty.any():
        out = p_where(~empty, out, m.identity(len(starts)))
    return out


def _tree_fold(m: Monoid, p: Partial, starts, ends) -> Partial:
    """Order-preserving segment-tree walk (general monoids; O(q log n)
    Python — the scalar fallback for monoids without 2-D scans (Collect)
    and the reference oracle _disjoint_sparse_fold is tested against)."""
    tree = FlatTree(m, p)
    outs = [tree.range_fold(int(s), int(e)) for s, e in zip(starts, ends)]
    return p_concat(*outs) if outs else m.identity(0)


def _disjoint_sparse_fold(m: Monoid, p: Partial, starts, ends) -> Partial:
    """Disjoint-sparse-table interval fold — O(1) COMBINES PER QUERY for
    ANY associative monoid (no idempotence, no inverse, order
    preserved), fully vectorized.

    Level k tiles the (identity-padded) array into blocks of 2^k; the
    left half of each block stores order-preserving SUFFIX folds to the
    block midpoint (raccumulate), the right half PREFIX folds from it
    (accumulate). A query [l, r] (inclusive) whose endpoints first
    diverge at bit k−1 lies in one level-k block with l left of the
    midpoint and r at/right of it, so its answer is exactly
    ``suffix_k[l] ⊕ prefix_k[r]`` — one combine. Queries are grouped by
    level: ≤ log n vectorized combines TOTAL, versus the per-query
    Python tree walk of :func:`_tree_fold` (the streaming multi-window
    profile showed 520k scalar ``combine`` calls per 1k-row key for
    MinCount — this path replaces them with ~10 array ops).

    Levels are built lazily (only those some query needs): each build is
    two block scans over the padded array, the same reshape-and-scan
    pattern as :func:`sliding_partials`."""
    n = p_len(p)
    starts = np.minimum(np.maximum(starts, 0), n)
    ends = np.minimum(np.maximum(ends, 0), n)
    q = len(starts)
    out = m.identity(q)
    last = ends - 1  # inclusive right endpoint
    nonempty = ends > starts
    single = nonempty & (last == starts)
    if single.any():
        res = p_take(p, starts[np.flatnonzero(single)])
        sel = single
        for key in out:
            out[key][sel] = res[key]
    multi = nonempty & ~single
    if not multi.any():
        return out
    L = max(1, int(n - 1).bit_length())
    N = 1 << L
    padded = p_concat(p, m.identity(N - n)) if N > n else p
    xor = starts[multi] ^ last[multi]
    # bit_length via frexp (exact for values < 2^53; N is far below)
    ks = np.frexp(xor.astype(np.float64))[1].astype(np.int64)  # k >= 1
    midx = np.flatnonzero(multi)
    for k in np.unique(ks):
        B = 1 << int(k)
        half = B >> 1
        blocked = {
            key: v.reshape((N // B, B) + v.shape[1:])
            for key, v in padded.items()
        }
        S = m.raccumulate({key: v[:, :half] for key, v in blocked.items()}, axis=1)
        F = m.accumulate({key: v[:, half:] for key, v in blocked.items()}, axis=1)
        arr = {
            key: np.concatenate([S[key], F[key]], axis=1).reshape(
                (N,) + padded[key].shape[1:]
            )
            for key in padded
        }
        sel = ks == k
        idx = midx[sel]
        res = m.combine(p_take(arr, starts[idx]), p_take(arr, last[idx]))
        for key in out:
            out[key][idx] = res[key]
    return out


class FlatTree:
    """FlatFAT-style complete binary tree of partials
    (cpp/src/Reactive.hpp:9-160 keeps the same implicit-array tree;
    here it is built bottom-up with one vectorized combine per level)."""

    def __init__(self, m: Monoid, p: Partial):
        self.m = m
        self.n = p_len(p)
        self.levels = [p]
        cur = p
        while p_len(cur) > 1:
            ln = p_len(cur)
            even = p_take(cur, np.arange(0, ln - 1, 2))
            odd = p_take(cur, np.arange(1, ln, 2))
            nxt = m.combine(even, odd)
            if ln % 2:
                nxt = p_concat(nxt, p_slice(cur, ln - 1, ln))
            self.levels.append(nxt)
            cur = nxt

    def range_fold(self, lo: int, hi: int) -> Partial:
        """Fold p[lo:hi) preserving order (non-commutative safe)."""
        m = self.m
        if hi <= lo:
            return m.identity(1)
        left_parts: list[Partial] = []
        right_parts: list[Partial] = []
        lvl = 0
        while lo < hi:
            cur = self.levels[lvl]
            if lo & 1:
                left_parts.append(p_slice(cur, lo, lo + 1))
                lo += 1
            if hi & 1:
                hi -= 1
                right_parts.append(p_slice(cur, hi, hi + 1))
            lo >>= 1
            hi >>= 1
            lvl += 1
            if lvl >= len(self.levels):
                break
        acc = m.identity(1)
        for part in left_parts:
            acc = m.combine(acc, part)
        for part in reversed(right_parts):
            acc = m.combine(acc, part)
        return acc


def interval_fold(m: Monoid, p: Partial, starts: np.ndarray, ends: np.ndarray) -> Partial:
    """out_q = fold of p[starts_q : ends_q) — strategy by monoid traits."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    if p_len(p) == 0 or len(starts) == 0:
        return m.identity(len(starts))
    if m.invertible and m.commutative:
        return _prefix_diff_fold(m, p, starts, ends)
    if m.idempotent:
        return _sparse_table_fold(m, p, starts, ends)
    if getattr(m, "scan2d", True):
        return _disjoint_sparse_fold(m, p, starts, ends)
    return _tree_fold(m, p, starts, ends)


class SegmentedSlidingKernel:
    """Multi-key count-window sliding aggregation over CONCATENATED
    segments — one vectorized pass for the whole Arrow batch, no per-key
    Python loop.

    Input batches are key-sorted (all rows of a key contiguous, stream
    order within); out_i = fold of the last ≤ w rows *of row i's segment*.
    Window starts are simply clamped to the segment start, so the whole
    batch is one :func:`interval_fold`:

    - invertible monoids → prefix-difference, O(n);
    - idempotent monoids → sparse table, O(n log w);
    - otherwise (MinCount, Collect) → per-segment two-stacks loop.

    Cross-batch carry: only the LAST segment can continue into the next
    batch; its trailing min(len, w−1) raw partials are retained and
    prepended (their outputs are dropped on re-emit).
    """

    def __init__(self, monoid: Monoid, w: int):
        self.m = monoid
        self.w = w
        self._fast = (monoid.invertible and monoid.commutative) or monoid.idempotent
        self.carry_key = None
        self.carry_tail: Partial | None = None
        self._slow_kernels: dict = {}

    @staticmethod
    def _norm_keys(seg_keys):
        """Accept one key array or a tuple of parallel key arrays; return
        (key_arrays, n, first_key, last_key, change_mask_fn)."""
        if not isinstance(seg_keys, tuple):
            seg_keys = (seg_keys,)
        n = len(seg_keys[0])
        change = np.empty(n, dtype=bool)
        if n:
            change[0] = True
            change[1:] = seg_keys[0][1:] != seg_keys[0][:-1]
            for extra in seg_keys[1:]:
                change[1:] |= extra[1:] != extra[:-1]
        first_key = tuple(k[0] for k in seg_keys) if n else None
        last_key = tuple(k[-1] for k in seg_keys) if n else None
        return n, change, first_key, last_key

    def process(self, seg_keys, p: Partial) -> Partial:
        m, w = self.m, self.w
        n, change, first_key, last_key = self._norm_keys(seg_keys)
        if n == 0:
            return m.identity(0)
        if not self._fast:
            return self._process_slow(change, first_key, last_key, p)
        ntail = 0
        if (
            self.carry_tail is not None
            and p_len(self.carry_tail)
            and first_key == self.carry_key
        ):
            ntail = p_len(self.carry_tail)
            p = p_concat(self.carry_tail, p)
        # per-row segment-start index, in concatenated coordinates: the
        # first batch segment starts at 0 when it continues the carry
        seg_start = np.where(change, np.arange(n) + ntail, 0)
        if ntail:
            seg_start[0] = 0
        first = np.maximum.accumulate(seg_start)
        if ntail:
            first = np.concatenate([np.zeros(ntail, dtype=np.int64), first])
        idx = np.arange(ntail + n)
        starts = np.maximum(idx - w + 1, first)
        ends = idx + 1
        out = interval_fold(m, p, starts, ends)
        # retain the last segment's tail for the next batch — .copy(), not
        # np.ascontiguousarray (a no-op view for an already-contiguous
        # leading-axis slice): a view would pin the whole concatenated
        # batch's arrays alive between batches (~batch/w × the intended
        # O(w) footprint)
        last_start = int(first[-1])
        tail_from = max(last_start, ntail + n - (w - 1)) if w > 1 else ntail + n
        self.carry_tail = (
            {k: v[tail_from:].copy() for k, v in p.items()}
            if w > 1
            else m.identity(0)
        )
        self.carry_key = last_key
        return p_slice(out, ntail, None)

    def _process_slow(self, change, first_key, last_key, p: Partial) -> Partial:
        m, w = self.m, self.w
        n = len(change)
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        outs = []
        # only the boundary segment's kernel needs to persist across batches
        last = None
        for j, (s, e) in enumerate(zip(starts, ends)):
            if j == 0 and first_key == self.carry_key and self._slow_kernels:
                k = self._slow_kernels.pop("boundary")
            else:
                k = SlidingCountWindow(m, w)
            outs.append(k.process_partials(p_take(p, slice(int(s), int(e)))))
            last = k
        self._slow_kernels = {"boundary": last}
        self.carry_key = last_key
        return p_concat(*outs) if len(outs) > 1 else outs[0]


class PositionalSegmentedKernel:
    """Multi-key VARIABLE count-window sliding aggregation over
    concatenated segments: out_i = fold of rows [start_fn(rn_i), rn_i] of
    row i's segment, where rn is the row's 0-based position in its
    segment and ``start_fn`` is a vectorized position→window-start map
    with bounded look-back (start_fn(rn) ≥ rn − max_back).

    Covers the reference's dynamic fill/drain scenarios
    (cpp/src/benchmark_core.h:149-183): e.g. the sawtooth window is
    ``start_fn = rn − rn % period`` with ``max_back = period − 1``.
    Same execution shape as :class:`SegmentedSlidingKernel` — one
    vectorized pass per Arrow batch, cross-batch carry of the open
    segment's last ≤ max_back partials + its position counter."""

    def __init__(self, monoid: Monoid, start_fn, max_back: int):
        self.m = monoid
        self.start_fn = start_fn
        self.max_back = int(max_back)
        self.carry_key = None
        self.carry_p: Partial | None = None
        self.carry_rn0 = 0  # rn of carry_p[0] in its segment

    def process(self, seg_keys, p: Partial) -> Partial:
        m = self.m
        n, change, first_key, last_key = SegmentedSlidingKernel._norm_keys(seg_keys)
        if n == 0:
            return m.identity(0)
        ntail = 0
        rn_base = 0
        if self.carry_p is not None and first_key == self.carry_key:
            # the position counter carries even when the carry TAIL is
            # empty (start_fn(next rn) may need no look-back rows, but the
            # segment's absolute rn must still continue, not restart at 0)
            rn_base = self.carry_rn0
            if p_len(self.carry_p):
                ntail = p_len(self.carry_p)
                p = p_concat(self.carry_p, p)
        total = ntail + n
        seg_start = np.where(change, np.arange(n) + ntail, 0)
        if ntail:
            seg_start[0] = 0
        first = np.maximum.accumulate(seg_start)
        if ntail:
            first = np.concatenate([np.zeros(ntail, dtype=np.int64), first])
        idx = np.arange(total)
        # segment-relative positions; the open segment continues at rn_base
        rn = idx - first + np.where(first == 0, rn_base, 0)
        win_start_rn = np.asarray(self.start_fn(rn), dtype=np.int64)
        if bool((win_start_rn < rn - self.max_back).any()):
            raise ValueError("start_fn exceeded max_back look-back")
        starts = idx - (rn - win_start_rn)  # concatenated coordinates
        # clamp to each row's segment start: a start_fn that returns a
        # position before the segment (e.g. negative) must not fold in the
        # previous key's rows — or wrap to the array end via negative
        # indexing in the sparse-table path
        starts = np.maximum(starts, first)
        out = interval_fold(m, p, starts, idx + 1)
        # carry: open segment's last ≤ max_back rows back to the earliest
        # position any future row's window can reach
        last_first = int(first[-1])
        last_rn = int(rn[-1])
        # future rows have rn' > last_rn; min future start = min over rn' >
        # last_rn of start_fn(rn') — bounded below by rn' − max_back, and
        # start_fn is evaluated exactly for the next max_back positions
        future_rn = last_rn + 1 + np.arange(self.max_back + 1)
        min_future_start = int(
            np.asarray(self.start_fn(future_rn), dtype=np.int64).min()
        )
        keep_rn = max(min(min_future_start, last_rn + 1), 0)
        r0 = int(rn[last_first])  # rn of the open segment's first held row
        keep_from = max(last_first + (keep_rn - r0), last_first)
        self.carry_p = {k: v[keep_from:].copy() for k, v in p.items()}
        self.carry_rn0 = keep_rn
        self.carry_key = last_key
        return p_slice(out, ntail, None)


class TimeSegmentedKernel:
    """Multi-key EVENT-TIME sliding aggregation over concatenated
    segments — the time-window analogue of :class:`SegmentedSlidingKernel`
    (one vectorized pass per Arrow batch, no per-key Python loop, no
    per-group Arrow frame).

    Input batches are key-sorted with rows time-ordered within each key;
    for every row i and every duration D in ``durations``,
    out_i[D] = fold over rows of i's segment with ts ∈ [ts_i − D, ts_i]
    (inclusive both ends — the reference's admit rule,
    cpp/src/benchmark_core.h:584-590). Several durations share ONE state
    and one prefix structure — the window-sharing mode
    (FiBA rangeQuery / twin benches, cpp/src/benchmark_core.h:472-562).

    Vectorization: per-segment ``searchsorted`` collapses to ONE global
    searchsorted by re-basing each segment's timestamps onto disjoint
    int64 islands (ts − seg_min + seg_idx·K with K > span + max(D)); when
    that offset would overflow int64 (astronomically long spans × many
    segments per batch) it falls back to a per-segment loop.

    Cross-batch carry: only the LAST segment can continue into the next
    batch; its rows within max(D) of its tail are retained (their windows
    can still be reached by future rows of the same key — anything older
    is unreachable because timestamps within a key are non-decreasing).
    """

    def __init__(self, monoid: Monoid, durations: dict[str, int]):
        self.m = monoid
        self.durations = dict(durations)
        self.max_dur = max(self.durations.values())
        self.carry_key = None
        self.carry_ts: np.ndarray | None = None
        self.carry_p: Partial | None = None

    def process(self, seg_keys, ts: np.ndarray, p: Partial) -> dict[str, Partial]:
        m = self.m
        n, change, first_key, last_key = SegmentedSlidingKernel._norm_keys(seg_keys)
        if n == 0:
            return {col: m.identity(0) for col in self.durations}
        ts = np.asarray(ts, dtype=np.int64)
        ntail = 0
        if (
            self.carry_ts is not None
            and len(self.carry_ts)
            and first_key == self.carry_key
        ):
            ntail = len(self.carry_ts)
            ts = np.concatenate([self.carry_ts, ts])
            p = p_concat(self.carry_p, p)
        total = ntail + n
        # per-row segment-start index in concatenated coordinates
        seg_start = np.where(change, np.arange(n) + ntail, 0)
        if ntail:
            seg_start[0] = 0
        first = np.maximum.accumulate(seg_start)
        if ntail:
            first = np.concatenate([np.zeros(ntail, dtype=np.int64), first])
        # island re-basing for one global searchsorted
        seg_min = ts[first]
        rel = ts - seg_min
        span = int(rel.max()) if total else 0
        seg_idx = np.cumsum(np.concatenate([[0], first[1:] != first[:-1]]))
        K = span + self.max_dur + 1
        ends = np.arange(1, total + 1)
        out: dict[str, Partial] = {}
        if K > 0 and int(seg_idx[-1]) < (2**62) // K:
            key_ts = rel + seg_idx * K
            for col, dur in self.durations.items():
                starts = np.searchsorted(key_ts, key_ts - dur, side="left")
                out[col] = p_slice(
                    interval_fold(m, p, np.maximum(starts, first), ends), ntail, None
                )
        else:  # pragma: no cover — would need ~millennia-long spans
            starts_by_col = {
                col: np.empty(total, dtype=np.int64) for col in self.durations
            }
            bounds = np.flatnonzero(np.concatenate([[True], first[1:] != first[:-1]]))
            bounds = np.append(bounds, total)
            for s, e in zip(bounds[:-1], bounds[1:]):
                seg_ts = ts[s:e]
                for col, dur in self.durations.items():
                    starts_by_col[col][s:e] = s + np.searchsorted(
                        seg_ts, seg_ts - dur, side="left"
                    )
            for col in self.durations:
                out[col] = p_slice(
                    interval_fold(m, p, starts_by_col[col], ends), ntail, None
                )
        # retain the open segment's reachable tail
        last_start = int(first[-1])
        keep_from = last_start + int(
            np.searchsorted(ts[last_start:], ts[-1] - self.max_dur, side="left")
        )
        self.carry_ts = ts[keep_from:].copy()
        # copy (not view) so the carry doesn't pin the whole batch's arrays
        self.carry_p = {k: v[keep_from:].copy() for k, v in p.items()}
        self.carry_key = last_key
        return out


def sliding_time_window(
    m: Monoid,
    ts: np.ndarray,
    p: Partial,
    duration,
    inclusive_start: bool = True,
) -> Partial:
    """Per-row event-time window: out_i = fold over rows with
    ts ∈ [ts_i − duration, ts_i] (``inclusive_start``) or
    (ts_i − duration, ts_i] — the reference's data loop evicts while
    ``youngest − oldest > duration`` i.e. KEEPS ts ≥ youngest − duration
    (cpp/src/benchmark_core.h:584-590), matching inclusive_start=True.

    ``ts`` must be sorted ascending. Tie rule: row i's window ends AT row
    i (ends = i + 1), so earlier rows sharing ts_i are included but LATER
    same-instant rows are not — per-arrival prefix semantics. (The
    streaming engine's post-insert side='right' query, engine.py, is the
    variant where all same-ts rows see each other.)
    """
    ts = np.asarray(ts)
    side = "left" if inclusive_start else "right"
    starts = np.searchsorted(ts, ts - duration, side=side)
    ends = np.arange(1, len(ts) + 1)
    return interval_fold(m, p, starts, ends)
