"""Per-operation SWAG algorithms — algorithm-for-algorithm parity layer.

These are faithful re-expressions (in Python, over the monoid library) of
the reference's window-maintenance algorithms, exposing the same
``insert(v)`` / ``evict()`` / ``query()`` / ``size()`` surface
(cpp/src/TwoStacks.hpp:24-80, cpp/src/TwoStacksLite.hpp:23-77,
cpp/src/SubtractOnEvict.hpp:20-64, cpp/src/ReCalc.hpp:20-55,
cpp/src/DABALite.hpp:29-225). They exist for differential testing and to
document parity with the reference's algorithm inventory (SURVEY.md §2.B);
the *production* path in Spark is the vectorized bulk kernels in
:mod:`.kernels`, which process whole Arrow batches per call.

All algorithms are published: Two-Stacks (folklore / Snodgrass),
SubtractOnEvict, DABA & DABA Lite (Tangwongsan, Hirzel, Schneider —
"Low-latency sliding-window aggregation in worst-case constant time",
DEBS'17 / VLDB J. 2021).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from ..functions.monoids import Monoid, Partial


class _Scalar:
    """Length-1-partial adapter so stepwise code reads like the reference."""

    def __init__(self, m: Monoid):
        self.m = m

    def lift(self, v) -> Partial:
        return self.m.lift1(v) if not isinstance(v, tuple) else self.m.lift(
            tuple([x] for x in v)
        )

    def combine(self, a, b):
        return self.m.combine(a, b)

    def lower(self, p):
        return self.m.lower1(p)

    @property
    def identity(self):
        return self.m.identity(1)


class ReCalc:
    """O(n)-query brute-force oracle (cpp/src/ReCalc.hpp:20-55): keeps the
    raw window; query re-folds it left-to-right (here as one vectorized
    lift+accumulate — same fold, same order)."""

    name = "recalc"

    def __init__(self, monoid: Monoid):
        self.m = monoid
        self.win: deque = deque()

    def size(self) -> int:
        return len(self.win)

    def insert(self, v) -> None:
        self.win.append(v)

    def evict(self) -> None:
        self.win.popleft()

    def query(self):
        if not self.win:
            return self.m.lower1(self.m.identity(1))
        if self.win and isinstance(self.win[0], tuple):  # argmax (arg, key)
            args = np.asarray([t[0] for t in self.win])
            keys = np.asarray([t[1] for t in self.win])
            return self.m.lower1(self.m.reduce(self.m.lift((args, keys))))
        return self.m.lower1(self.m.lift_reduce(np.asarray(list(self.win))))


class SubtractOnEvict:
    """Running total ⊕ on insert, ⊖ on evict — invertible ops only
    (cpp/src/SubtractOnEvict.hpp:20-64; compile-time guard mirrored from
    rust/tests/trybuild_soe_max.fail)."""

    name = "soe"

    def __init__(self, monoid: Monoid):
        if not monoid.invertible:
            raise TypeError("SubtractOnEvict requires an invertible monoid")
        self.m = monoid
        self.op = _Scalar(monoid)
        self.win: deque = deque()
        self.total = self.op.identity

    def size(self) -> int:
        return len(self.win)

    def insert(self, v) -> None:
        p = self.op.lift(v)
        self.win.append(p)
        self.total = self.op.combine(self.total, p)

    def evict(self) -> None:
        old = self.win.popleft()
        self.total = self.m.inverse_combine(self.total, old)

    def query(self):
        return self.op.lower(self.total)


class TwoStacks:
    """Two stacks of (value, running-agg) pairs; amortized O(1)
    (cpp/src/TwoStacks.hpp:24-80). Front-stack aggs run from each entry to
    the stack bottom (= oldest-to-that-entry in time order reversed at
    flip); back-stack aggs run bottom-to-top."""

    name = "two_stacks"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        # each stack entry: (val_partial, agg_partial)
        self.front: list[tuple[Partial, Partial]] = []
        self.back: list[tuple[Partial, Partial]] = []

    def size(self) -> int:
        return len(self.front) + len(self.back)

    def _back_total(self) -> Partial:
        return self.back[-1][1] if self.back else self.op.identity

    def insert(self, v) -> None:
        p = self.op.lift(v)
        agg = self.op.combine(self._back_total(), p)
        self.back.append((p, agg))

    def _flip(self) -> None:
        # pop back newest-first onto front: front agg at each entry =
        # combine(entry, younger-agg) → suffix agg in time order
        # (cpp/src/TwoStacks.hpp:45-52)
        acc = self.op.identity
        while self.back:
            p, _ = self.back.pop()
            acc = self.op.combine(p, acc)
            self.front.append((p, acc))

    def evict(self) -> None:
        if not self.front:
            self._flip()
        self.front.pop()

    def query(self):
        f = self.front[-1][1] if self.front else self.op.identity
        return self.op.lower(self.op.combine(f, self._back_total()))


class TwoStacksLite:
    """Two-Stacks storing only the front agg stack plus a single back
    running sum — n+1 partials (cpp/src/TwoStacksLite.hpp:23-77).
    Keeps raw back values (needed at flip) but no per-entry back aggs."""

    name = "two_stacks_lite"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.front: list[Partial] = []  # suffix aggs, top = oldest
        self.back_vals: list[Partial] = []
        self.back_sum = self.op.identity

    def size(self) -> int:
        return len(self.front) + len(self.back_vals)

    def insert(self, v) -> None:
        p = self.op.lift(v)
        self.back_vals.append(p)
        self.back_sum = self.op.combine(self.back_sum, p)  # hpp:38

    def _flip(self) -> None:
        acc = self.op.identity
        for p in reversed(self.back_vals):  # hpp:45-53
            acc = self.op.combine(p, acc)
            self.front.append(acc)
        self.back_vals = []
        self.back_sum = self.op.identity

    def evict(self) -> None:
        if not self.front:
            self._flip()
        self.front.pop()

    def query(self):  # hpp:56-64
        f = self.front[-1] if self.front else self.op.identity
        return self.op.lower(self.op.combine(f, self.back_sum))


class DABALite:
    """De-amortized banker's aggregator, worst-case O(1) per op, n+2
    partials (cpp/src/DABALite.hpp:29-225; DEBS'17). The queue holds one
    agg per slot; four indices l ≤ r ≤ a ≤ b partition the front; two
    scalars midSum/backSum cover the middle and back regions. Every
    insert/evict performs ≤ 2 fix-up combines (``_step``,
    DABALite.hpp:93-140)."""

    name = "daba_lite"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.q: list[Partial] = []
        self.offset = 0  # popped-from-front count; indices below are absolute
        self._head = 0  # consumed front slots kept for O(1) eviction
        self.l = self.r = self.a = self.b = 0
        self.mid_sum = self.op.identity
        self.back_sum = self.op.identity

    # -- region helpers (DABALite.hpp:196-207) --
    def _begin(self) -> int:
        return self.offset

    def _end(self) -> int:
        return self.offset + self.size()

    def _get(self, i: int) -> Partial:
        return self.q[i - self.offset + self._head]

    def _set(self, i: int, v: Partial) -> None:
        self.q[i - self.offset + self._head] = v

    def size(self) -> int:
        return len(self.q) - self._head

    def _is_front_empty(self) -> bool:
        return self.b == self._begin()

    def _get_alpha(self) -> Partial:
        return self.op.identity if self._is_front_empty() else self._get(self._begin())

    def _get_delta(self) -> Partial:
        return self.op.identity if self.a == self.b else self._get(self.a)

    def insert(self, v) -> None:
        p = self.op.lift(v)
        self.back_sum = self.op.combine(self.back_sum, p)
        self.q.append(p)
        self._step()

    def evict(self) -> None:
        # lazy compaction (see DABA.evict): O(1) pointer move, amortized
        # O(1) physical cleanup
        self._head += 1
        self.offset += 1
        if self._head > 32 and self._head * 2 > len(self.q):
            del self.q[: self._head]
            self._head = 0
        self._step()

    def query(self):
        if not self.size():
            return self.op.lower(self.op.identity)
        return self.op.lower(self.op.combine(self._get_alpha(), self.back_sum))

    def _flip(self) -> None:  # DABALite.hpp:208-215
        self.l = self._begin()
        self.r = self.b
        self.a = self._end()
        self.b = self._end()
        self.mid_sum = self.back_sum
        self.back_sum = self.op.identity

    def _step(self) -> None:  # DABALite.hpp:93-140
        if self.l == self.b:
            self._flip()
        if not self._is_front_empty():
            if self.a != self.r:
                prev_delta = self._get_delta()
                self.a -= 1
                self._set(self.a, self.op.combine(self._get(self.a), prev_delta))
            if self.l != self.r:
                self._set(self.l, self.op.combine(self._get(self.l), self.mid_sum))
                self.l += 1
            else:
                self.l += 1
                self.r += 1
                self.a += 1
                self.mid_sum = self._get_delta()
        else:
            self.back_sum = self.mid_sum = self.op.identity


class ImplicitTwoStacksLite:
    """Both stacks in ONE deque with an in-place flip — the suffix scan
    rewrites the queue's values as running suffix aggregates
    (cpp/src/ImplicitTwoStacksLite.hpp:23-86; this in-place suffix scan is
    exactly what vectorizes into kernels.sliding_partials)."""

    name = "implicit_two_stacks_lite"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.q: deque = deque()
        self.num_flipped = 0
        self.back_sum = self.op.identity

    def size(self) -> int:
        return len(self.q)

    def insert(self, v) -> None:
        p = self.op.lift(v)
        self.back_sum = self.op.combine(self.back_sum, p)
        self.q.append(p)

    def _flip(self) -> None:  # hpp:60-77
        # already O(n): rebuild the deque with suffix aggregates in place
        acc = self.op.identity
        flipped = []
        for x in reversed(self.q):
            acc = self.op.combine(x, acc)
            flipped.append(acc)
        self.q = deque(reversed(flipped))
        self.back_sum = self.op.identity
        self.num_flipped = len(self.q)

    def evict(self) -> None:
        if self.num_flipped == 0:
            self._flip()
        self.q.popleft()
        self.num_flipped -= 1

    def query(self):
        f = self.q[0] if self.num_flipped > 0 else self.op.identity
        return self.op.lower(self.op.combine(f, self.back_sum))


class ABA:
    """Implicit-queue ABA: one deque of (val, agg) where back entries carry
    prefix aggs and flipped front entries carry suffix aggs; the boundary
    is an index (cpp/src/ImplicitQueueABA.hpp:31-93)."""

    name = "aba"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.q: deque = deque()  # [val, agg] entries
        self.b = 0  # boundary: entries [0, b) are flipped front

    def size(self) -> int:
        return len(self.q)

    def insert(self, v) -> None:
        prev = self.q[-1][1] if len(self.q) > self.b else self.op.identity
        p = self.op.lift(v)
        self.q.append([p, self.op.combine(prev, p)])

    def evict(self) -> None:
        if self.b == 0:  # front empty → suffix flip (hpp:55-64; O(n) by design)
            acc = self.op.identity
            for node in reversed(self.q):
                acc = self.op.combine(node[0], acc)
                node[1] = acc
            self.b = len(self.q)
        self.q.popleft()
        self.b -= 1

    def query(self):
        bp = self.q[-1][1] if len(self.q) > self.b else self.op.identity
        fp = self.q[0][1] if self.b > 0 else self.op.identity
        return self.op.lower(self.op.combine(fp, bp))


class DABA:
    """Full DABA: worst-case O(1) with per-slot (val, agg) pairs and the
    l/r/a/b pointer quadruple; differs from DABA Lite by keeping per-slot
    aggs (no midSum) and reading gamma from a−1
    (cpp/src/DABA.hpp:50-271, _step at 118-163)."""

    name = "daba"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.q: list[list] = []  # [val, agg]
        self.offset = 0
        self._head = 0  # consumed front slots kept for O(1) eviction
        self.l = self.r = self.a = self.b = 0

    def _begin(self):
        return self.offset

    def _end(self):
        return self.offset + self.size()

    def _node(self, i):
        return self.q[i - self.offset + self._head]

    def size(self) -> int:
        return len(self.q) - self._head

    def _is_front_empty(self):
        return self.b == self._begin()

    def _get_alpha(self):
        return self._node(self._begin())[1] if not self._is_front_empty() else self.op.identity

    def _get_delta(self):
        return self._node(self.a)[1] if self.a != self.b else self.op.identity

    def _get_gamma(self):
        return self._node(self.a - 1)[1] if self.a != self.r else self.op.identity

    def _get_back(self):
        return self.q[-1][1] if self.b != self._end() else self.op.identity

    def insert(self, v) -> None:
        p = self.op.lift(v)
        prev = self._get_back()
        self.q.append([p, self.op.combine(prev, p)])
        self._step()

    def evict(self) -> None:
        # lazy compaction: advance the head pointer (O(1)); physically drop
        # the consumed prefix only when it dominates the list (amortized
        # O(1)/evict, preserving the worst-case O(1) combine count the
        # reference's DABA is about — list.pop(0) would memmove O(n))
        self._head += 1
        self.offset += 1
        if self._head > 32 and self._head * 2 > len(self.q):
            del self.q[: self._head]
            self._head = 0
        self._step()

    def query(self):
        if not self.size():
            return self.op.lower(self.op.identity)
        return self.op.lower(self.op.combine(self._get_alpha(), self._get_back()))

    def _flip(self):  # DABA.hpp:265-270
        self.l = self._begin()
        self.r = self.b
        self.a = self._end()
        self.b = self._end()

    def _step(self):  # DABA.hpp:118-163
        if self.l == self.b:
            self._flip()
        if not self._is_front_empty():
            if self.a != self.r:
                prev_delta = self._get_delta()
                self.a -= 1
                node = self._node(self.a)
                node[1] = self.op.combine(node[0], prev_delta)
            if self.l != self.r:
                ra = self.op.combine(self._get_gamma(), self._get_delta())
                node = self._node(self.l)
                node[1] = self.op.combine(node[1], ra)
                self.l += 1
            else:
                self.l += 1
                self.r += 1
                self.a += 1


class FlatFIT:
    """Static FlatFIT: ring buffer of (val, next) skip pointers; query
    pointer-chases front→back then path-compresses, caching suffix sums
    (cpp/src/FlatFIT.hpp:29-107; capacity freezes at first evict,
    l.46-48)."""

    name = "flatfit"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.buf: list[list] = []  # [val, next]
        self.sz = 0
        self.ever_evicted = False
        self.front = 0
        self.back = -1

    def size(self) -> int:
        return self.sz

    def insert(self, v) -> None:
        if self.ever_evicted and self.sz + 1 > len(self.buf):
            raise OverflowError("static FlatFIT cannot grow after first evict")
        prev = self.back if self.sz > 0 else -1
        node = [self.op.lift(v), 0]
        self.back += 1
        self.sz += 1
        if self.ever_evicted:
            self.back %= len(self.buf)
            self.buf[self.back] = node
        else:
            self.buf.append(node)
        if prev >= 0:
            self.buf[prev][1] = self.back

    def evict(self) -> None:
        self.ever_evicted = True
        self.front = (self.front + 1) % len(self.buf)
        self.sz -= 1

    def query(self):
        if self.sz == 0:
            return self.op.lower(self.op.identity)
        trace = []
        cur = self.front
        while cur != self.back:
            trace.append(cur)
            cur = self.buf[cur][1]
        acc = self.op.identity
        while trace:
            i = trace.pop()
            acc = self.op.combine(self.buf[i][0], acc)
            self.buf[i] = [acc, self.back]  # path compression
        return self.op.lower(self.op.combine(acc, self.buf[self.back][0]))


class DynamicFlatFIT:
    """FlatFIT with geometric grow/shrink (THRES=2) and pointer reindexing
    on rescale (cpp/src/DynamicFlatFIT.hpp:33-137)."""

    name = "dynamic_flatfit"
    LOW_CAP = 4
    THRES = 2

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.buf: list = [None] * self.LOW_CAP
        self.sz = 0
        self.front = 0
        self.back = -1

    def size(self) -> int:
        return self.sz

    def _rescale(self, new_size: int) -> None:
        new_size = max(new_size, self.LOW_CAP)
        old = self.buf
        old_cap = len(old)
        nb: list = [None] * new_size
        for i in range(self.sz):
            elt = old[(self.front + i) % old_cap]
            nb[i] = [elt[0], (elt[1] + old_cap - self.front) % old_cap]
        self.buf = nb
        self.front = 0
        self.back = self.sz - 1

    def insert(self, v) -> None:
        if self.sz + 1 > len(self.buf):
            self._rescale(len(self.buf) * self.THRES)
        prev = self.back if self.sz > 0 else -1
        self.back = (self.back + 1) % len(self.buf)
        self.sz += 1
        self.buf[self.back] = [self.op.lift(v), 0]
        if prev >= 0:
            self.buf[prev][1] = self.back

    def evict(self) -> None:
        self.front = (self.front + 1) % len(self.buf)
        self.sz -= 1
        if self.sz < len(self.buf) // (2 * self.THRES):
            self._rescale(len(self.buf) // self.THRES)

    # identical trace-chase + path compression as the static variant —
    # one implementation serves both
    query = FlatFIT.query


class Reactive:
    """Reactive / FlatFAT: an implicit complete binary tree over a
    power-of-two ring; mutations mark leaves dirty, query propagates the
    dirty set up level-by-level (cpp/src/Reactive.hpp:9-160 — propagate
    l.87-128, geometric resize l.66-75). O(log n) per changed leaf."""

    name = "reactive"
    INITIAL = 4

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.cap = self.INITIAL
        self.tree: list = [self.op.identity] * (2 * self.cap)
        self.front = 0
        self.sz = 0
        self.dirty: set[int] = set()

    def size(self) -> int:
        return self.sz

    def _leaf(self, pos: int) -> int:
        return self.cap + pos

    def _set_leaf(self, pos: int, val) -> None:
        self.tree[self.cap + pos] = val
        self.dirty.add(self.cap + pos)

    def _resize(self, ncap: int) -> None:
        vals = [self.tree[self.cap + (self.front + i) % self.cap] for i in range(self.sz)]
        self.cap = ncap
        self.tree = [self.op.identity] * (2 * ncap)
        self.front = 0
        for i, v in enumerate(vals):
            self.tree[ncap + i] = v
        self.dirty = set(range(ncap, 2 * ncap))

    def insert(self, v) -> None:
        if self.sz == self.cap:
            self._resize(2 * self.cap)
        self._set_leaf((self.front + self.sz) % self.cap, self.op.lift(v))
        self.sz += 1

    def evict(self) -> None:
        self._set_leaf(self.front, self.op.identity)
        self.front = (self.front + 1) % self.cap
        self.sz -= 1
        if self.cap > self.INITIAL and self.sz < self.cap // 4:
            self._resize(max(self.INITIAL, self.cap // 2))

    def _propagate(self) -> None:
        frontier = {i >> 1 for i in self.dirty}
        self.dirty.clear()
        while frontier and min(frontier) >= 1:
            nxt = set()
            for i in frontier:
                if i < 1:
                    continue
                self.tree[i] = self.op.combine(self.tree[2 * i], self.tree[2 * i + 1])
                if i > 1:
                    nxt.add(i >> 1)
            frontier = nxt

    def query(self):
        """Whole-window fold. NOTE: with a wrapped (circular) window the
        root is a rotated fold; for non-commutative ops the reference
        queries prefix/suffix pieces — here we fold front→end and
        start→front-1 explicitly for full generality."""
        if self.sz == 0:
            return self.op.lower(self.op.identity)
        self._propagate()
        end = self.front + self.sz
        if end <= self.cap:
            acc = self._range(self.front, end)
        else:
            acc = self.op.combine(
                self._range(self.front, self.cap), self._range(0, end % self.cap)
            )
        return self.op.lower(acc)

    def _range(self, lo: int, hi: int):
        """Order-preserving fold of leaves [lo, hi) via the implicit tree."""
        lo += self.cap
        hi += self.cap
        left = []
        right = []
        while lo < hi:
            if lo & 1:
                left.append(self.tree[lo])
                lo += 1
            if hi & 1:
                hi -= 1
                right.append(self.tree[hi])
            lo >>= 1
            hi >>= 1
        acc = self.op.identity
        for p in left:
            acc = self.op.combine(acc, p)
        for p in reversed(right):
            acc = self.op.combine(acc, p)
        return acc


class _Cons:
    """Cons cell with (val, agg) and an optionally suspended tail."""

    __slots__ = ("val", "agg", "_tail", "_thunk")

    def __init__(self, val, agg, tail=None, thunk=None):
        self.val = val
        self.agg = agg
        self._tail = tail
        self._thunk = thunk

    def tail(self):
        if self._thunk is not None:
            self._tail = self._thunk()
            self._thunk = None
        return self._tail


class OkasakisQueue:
    """IOA over Okasaki's real-time queue: purely functional F/B/N lists
    with aggregates on every cons and an incrementally-forced lazy rotate —
    worst-case O(1) per op (cpp/src/OkasakisQueue.hpp:79-159; rotation
    l.125-144)."""

    name = "okasaki"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.F = None
        self.B = None
        self.N = None
        self._n = 0  # O(1) size: walking F/B would force every suspension

    def _agg(self, node):
        return node.agg if node is not None else self.op.identity

    def size(self) -> int:
        return self._n

    def _rot(self, L, R, A):
        """rot(L, R, A) ≡ L ++ reverse(R) ++ A with per-cons aggregates;
        the recursive rest is a suspension whose aggregate is precomputed
        from the sub-aggregates so queries never force it
        (OkasakisQueue.hpp:125-144). Python note: we read L.tail()/R.tail()
        while *building* the suspension, so forcing discipline is relaxed
        versus the reference's fully lazy node — semantics are identical,
        only the worst-case-O(1) forcing schedule differs."""
        rv = R.val
        next_a = _Cons(rv, self.op.combine(rv, self._agg(A)), A)
        if L is None:
            return next_a
        lt, rt = L.tail(), R.tail()
        rest_agg = self.op.combine(
            self._agg(lt), self.op.combine(self._agg(rt), next_a.agg)
        )
        return _Cons(
            L.val,
            self.op.combine(L.val, rest_agg),
            None,
            lambda: self._rot(lt, rt, next_a),
        )

    def _step(self):
        if self.N is None:
            new_f = self._rot(self.F, self.B, None)
            self.F = self.N = new_f
            self.B = None
        else:
            self.N = self.N.tail()

    def insert(self, v) -> None:
        p = self.op.lift(v)
        self.B = _Cons(p, self.op.combine(self._agg(self.B), p), self.B)
        self._n += 1
        self._step()

    def evict(self) -> None:
        self.F = self.F.tail()
        self._n -= 1
        self._step()

    def query(self):
        return self.op.lower(self.op.combine(self._agg(self.F), self._agg(self.B)))


class _ANode:
    """AMTA tree node: ≤ 2 (agg, time, child) slots; arity ∈ {0, 1, 2, −1}
    where −1 = left slot popped (cpp/src/AMTA.hpp:47-76)."""

    __slots__ = ("agg", "times", "children", "parent", "arity")

    def __init__(self, a, t, left):
        self.agg = [None, None]
        self.times = [None, None]
        self.children = [None, None]
        self.parent = None
        self.arity = 0
        self.push_back(a, t, left)

    def push_back(self, a, t, child):
        assert self.arity in (0, 1)
        self.agg[self.arity] = a
        self.times[self.arity] = t
        self.children[self.arity] = child
        self.arity += 1
        if child is not None:
            child.parent = self

    def pop_front(self):
        assert self.arity != 0
        if abs(self.arity) == 1:
            self.arity = 0
            return self.children[1]
        self.arity = -1
        return self.children[0]

    def left_popped(self):
        return self.arity == -1

    def right_empty(self):
        return self.arity == 1

    def full(self):
        return self.arity == 2


class AMTA:
    """Amortized Monoid Tree Aggregator (cpp/src/AMTA.hpp:29-368): a
    binary-counter forest of aggregation trees — ``insert`` runs a carry
    chain over the tail roots (AMTA.hpp:321-353), ``evict`` pops the front
    leaf and walks up (AMTA.hpp:165-186), ``bulkEvict(t)`` drops whole
    roots and slices the boundary root along the time path
    (AMTA.hpp:244-290), ``query`` = frontSum ⊕ backSum (AMTA.hpp:308-310).
    In-order timestamps only (like the reference)."""

    name = "amta"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.tails: list[_ANode] = []
        self.front_node: _ANode | None = None
        self.front_stack: list[Partial] = []
        self.front_sum = self.op.identity
        self.back_sum = self.op.identity
        self._size = 0

    # -- helpers ---------------------------------------------------------
    def size(self) -> int:
        return self._size

    def oldest(self):
        fn = self.front_node
        return fn.times[1] if fn.left_popped() else fn.times[0]

    def youngest(self):
        back = self.tails[0]
        return back.times[1] if (back.full() or back.left_popped()) else back.times[0]

    def _rebuild_front_from(self, c: _ANode | None) -> None:
        agg = self.front_stack[-1] if self.front_stack else self.op.identity
        while c is not None:
            nxt = c.children[1] if c.left_popped() else c.children[0]
            if c.full():
                agg = self.op.combine(c.agg[1], agg)
                self.front_stack.append(agg)
            if nxt is None:
                self.front_node = c
            c = nxt

    def _rebuild_front(self) -> None:
        if not self.tails:
            self.front_sum = self.op.identity
            return
        self.front_stack = []
        self._rebuild_front_from(self.tails[-1])
        agg = self.front_stack[-1] if self.front_stack else self.op.identity
        fn = self.front_node
        other = fn.agg[0] if (fn.full() or fn.right_empty()) else fn.agg[1]
        self.front_sum = self.op.combine(other, agg)

    def _rebuild_back(self) -> None:
        if not self.tails:
            self.back_sum = self.op.identity
            return
        agg = self.op.identity
        for c in reversed(self.tails[:-1]):
            node_agg = (
                self.op.combine(c.agg[0], c.agg[1]) if c.full() else c.agg[0]
            )
            agg = self.op.combine(agg, node_agg)
        self.back_sum = agg

    # -- ops ---------------------------------------------------------------
    def insert(self, v, t=None) -> None:
        if t is None:
            t = 0 if not self.tails else self.youngest() + 1
        self.insert_lifted(t, self.op.lift(v))
        if self._size >= 0:  # size tracking stops after bulk_evict (sentinel)
            self._size += 1

    def insert_lifted(self, t, lifted: Partial) -> None:  # AMTA.hpp:321-353
        has_carry = True
        carried_from = None
        carry, carry_time = lifted, t
        big_root_hit = False
        self.back_sum = self.op.combine(self.back_sum, lifted)
        for i, node in enumerate(self.tails):
            if node.full() or node.left_popped():  # room for carry above
                next_carry = (
                    self.op.combine(node.agg[0], node.agg[1])
                    if node.full()
                    else node.agg[1]
                )
                next_time = node.times[1]
                self.tails[i] = _ANode(carry, carry_time, carried_from)
                carried_from, carry, carry_time = node, next_carry, next_time
            else:
                node.push_back(carry, carry_time, carried_from)
                has_carry = False
                if i + 1 == len(self.tails):
                    big_root_hit = True
                break
        if has_carry:
            n = _ANode(carry, carry_time, carried_from)
            if not self.tails:
                self.front_node = n
            self.tails.append(n)
        elif big_root_hit:
            self._rebuild_front()
            self._rebuild_back()

    def evict(self) -> None:  # AMTA.hpp:165-186
        self.front_sum = self.front_stack[-1] if self.front_stack else self.op.identity
        if self._size > 0:
            self._size -= 1
        c = self.front_node
        while c is not None:
            if c.full():
                self.front_stack.pop()
            c.pop_front()
            if c.arity != 0:
                break
            c = c.parent
        if c is None:  # the big root emptied
            self.tails.pop()
            self.front_node = None
            self._rebuild_front()
            self._rebuild_back()
        else:
            self._rebuild_front_from(c)

    def _slice(self, node: _ANode | None, t) -> None:  # AMTA.hpp:186-207
        while node is not None:
            if not node.left_popped():
                if t < node.times[0]:
                    node = node.children[0]
                    continue
                if t == node.times[0]:
                    node.pop_front()
                    break
            if not node.right_empty() and t < node.times[1]:
                if not node.left_popped():
                    node.pop_front()
                node = node.children[1]
                continue
            raise AssertionError("unreachable slice state (AMTA.hpp:205)")

    def bulk_evict(self, t) -> None:  # AMTA.hpp:244-290
        if not self.tails or t < self.oldest():
            return
        self._size = -1  # size tracking stops (as in the reference)
        while self.tails:
            head = self.tails[-1]
            most_recent = head.times[0] if head.right_empty() else head.times[1]
            if t < most_recent:
                if head.full():
                    if t >= head.times[0]:
                        head.pop_front()
                        self._slice(head.children[1], t)
                    else:
                        self._slice(head.children[0], t)
                else:
                    ind = 0 if head.right_empty() else 1
                    self._slice(head.children[ind], t)
                break
            self.tails.pop()
            if most_recent == t:
                break
        self._rebuild_back()
        self._rebuild_front()

    def query(self):
        return self.op.lower(self.op.combine(self.front_sum, self.back_sum))


ALGORITHMS = {
    "recalc": ReCalc,
    "soe": SubtractOnEvict,
    "two_stacks": TwoStacks,
    "two_stacks_lite": TwoStacksLite,
    "implicit_two_stacks_lite": ImplicitTwoStacksLite,
    "aba": ABA,
    "daba": DABA,
    "daba_lite": DABALite,
    "flatfit": FlatFIT,
    "dynamic_flatfit": DynamicFlatFIT,
    "reactive": Reactive,
    "okasaki": OkasakisQueue,
    "amta": AMTA,
}


def make(name: str, monoid: Monoid):
    return ALGORITHMS[name](monoid)
