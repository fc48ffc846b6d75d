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

from ..functions.monoids import Monoid, Partial, p_take


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
    raw window; query folds it left-to-right with recalc_combine."""

    name = "recalc"

    def __init__(self, monoid: Monoid):
        self.op = _Scalar(monoid)
        self.win: list[Partial] = []

    def size(self) -> int:
        return len(self.win)

    def insert(self, v) -> None:
        self.win.append(self.op.lift(v))

    def evict(self) -> None:
        self.win.pop(0)

    def query(self):
        acc = self.op.identity
        for p in self.win:
            acc = self.op.combine(acc, p)
        return self.op.lower(acc)


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
        self.win: list[Partial] = []
        self.total = self.op.identity

    def size(self) -> int:
        return len(self.win)

    def insert(self, v) -> None:
        p = self.op.lift(v)
        self.win.append(p)
        self.total = self.op.combine(self.total, p)

    def evict(self) -> None:
        old = self.win.pop(0)
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
        self.l = self.r = self.a = self.b = 0
        self.mid_sum = self.op.identity
        self.back_sum = self.op.identity

    # -- region helpers (DABALite.hpp:196-207) --
    def _begin(self) -> int:
        return self.offset

    def _end(self) -> int:
        return self.offset + len(self.q)

    def _get(self, i: int) -> Partial:
        return self.q[i - self.offset]

    def _set(self, i: int, v: Partial) -> None:
        self.q[i - self.offset] = v

    def size(self) -> int:
        return len(self.q)

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
        self.q.pop(0)
        self.offset += 1
        self._step()

    def query(self):
        if not self.q:
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


ALGORITHMS = {
    "recalc": ReCalc,
    "soe": SubtractOnEvict,
    "two_stacks": TwoStacks,
    "two_stacks_lite": TwoStacksLite,
    "daba_lite": DABALite,
}


def make(name: str, monoid: Monoid):
    return ALGORITHMS[name](monoid)
