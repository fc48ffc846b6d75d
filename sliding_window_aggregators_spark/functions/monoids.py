"""The aggregation-monoid library, vectorized over NumPy columns.

Re-expresses the reference's aggregation functions
(``cpp/src/AggregationFunctions.hpp:13-617``) as *columnar* monoids: a
``Partial`` is a dict of equally-shaped NumPy arrays (one per partial
field), so every ``lift`` / ``combine`` / ``accumulate`` / ``lower`` is a
whole-batch vector operation — no per-row Python in any hot path (the
BASELINE input_hint mandates vectorized pandas/Arrow UDFs throughout).

Each monoid mirrors the reference triple ``(In, Partial, Out)`` plus
``lift`` / ``combine`` / ``lower`` / ``identity`` and optionally
``inverse_combine`` (cpp/src/AggregationFunctions.hpp:13-41 is the
canonical shape; the Rust port names the algebra explicitly in
rust/src/ops/mod.rs:52-73 — ``AggregateMonoid`` vs ``AggregateGroup``).

Sequence axis convention: ``accumulate``/``raccumulate`` fold along
``axis`` over the *scalar* fields; fields with trailing payload
dimensions (Bloom's 512-byte bitset) keep those trailing dims.
``accumulate`` is the inclusive left-fold prefix scan
(``A_i = p_0 ⊕ … ⊕ p_i``); ``raccumulate`` is the *order-preserving*
suffix scan (``S_i = p_i ⊕ … ⊕ p_{n-1}``) — the vectorized form of the
two-stacks "flip" (cpp/src/ImplicitTwoStacksLite.hpp:60-77).
"""

from __future__ import annotations

import numpy as np

Partial = dict  # dict[str, np.ndarray]

# ---------------------------------------------------------------------------
# Partial helpers (columnar structs)
# ---------------------------------------------------------------------------


def p_len(p: Partial) -> int:
    return len(next(iter(p.values())))


def p_concat(*ps: Partial) -> Partial:
    keys = ps[0].keys()
    return {k: np.concatenate([p[k] for p in ps]) for k in keys}


def p_take(p: Partial, idx) -> Partial:
    return {k: v[idx] for k, v in p.items()}


def p_slice(p: Partial, start: int, stop: int | None = None) -> Partial:
    return {k: v[start:stop] for k, v in p.items()}


def p_reverse(p: Partial, axis: int = 0) -> Partial:
    return {k: np.flip(v, axis=axis) for k, v in p.items()}


def p_where(cond: np.ndarray, a: Partial, b: Partial) -> Partial:
    out = {}
    for k in a:
        c = cond
        av, bv = a[k], b[k]
        if av.ndim > c.ndim:  # trailing payload dims (bloom bits)
            c = c.reshape(c.shape + (1,) * (av.ndim - c.ndim))
        out[k] = np.where(c, av, bv)
    return out


def p_copy(p: Partial) -> Partial:
    return {k: np.array(v, copy=True) for k, v in p.items()}


def _shift_prev(arr: np.ndarray, axis: int, fill) -> np.ndarray:
    """arr shifted +1 along axis, first slot = fill."""
    out = np.roll(arr, 1, axis=axis)
    sl = [slice(None)] * arr.ndim
    sl[axis] = 0
    out[tuple(sl)] = fill
    return out


# ---------------------------------------------------------------------------
# Monoid base
# ---------------------------------------------------------------------------


class Monoid:
    """Base class: an associative operator packaged as lift/combine/lower.

    Mirrors cpp/src/AggregationFunctions.hpp:13-41 (Sum is the canonical
    instance). Subclasses set:

    - ``name``
    - ``invertible``  — has ``inverse_combine`` (an ``AggregateGroup``,
      rust/src/ops/mod.rs:62-73); enables SubtractOnEvict.
    - ``commutative`` — ``raccumulate`` may be implemented by reversal.
    - ``idempotent``  — ``combine(a, a) == a``; enables overlapping
      sparse-table range folds.
    """

    name: str = "monoid"
    invertible: bool = False
    commutative: bool = True
    idempotent: bool = False
    # Largest window for which the one-shot sliding fold uses the
    # log-doubling path (ceil(log2 w) shifted combines) instead of the
    # block prefix/suffix scans — measured per-family crossover: the
    # doubling wins while 2*log2(w) combine passes cost less than the
    # scans' ~7 materializations + flip copies. Monoids whose
    # accumulate() is much slower than combine() (HLL's lane-max scan)
    # raise it. See operators/kernels.py sliding_partials.
    doubling_threshold: int = 32
    # SubtractOnEvict is only sound when inverse_combine is total over the
    # input domain; monoids whose inverse degenerates at a domain boundary
    # (geomean's ±inf log partials) or is deliberately lossy (BusyLoop)
    # set this False so the auto strategy avoids SOE
    soe_safe: bool = True

    # --- required API ---
    def lift(self, values: np.ndarray) -> Partial:
        raise NotImplementedError

    def identity(self, n: int = 1) -> Partial:
        raise NotImplementedError

    def combine(self, a: Partial, b: Partial) -> Partial:
        raise NotImplementedError

    def lower(self, p: Partial) -> np.ndarray:
        raise NotImplementedError

    def accumulate(self, p: Partial, axis: int = 0) -> Partial:
        raise NotImplementedError

    # --- derived API ---
    def inverse_combine(self, a: Partial, b: Partial) -> Partial:
        raise NotImplementedError(f"{self.name} is not invertible")

    def raccumulate(self, p: Partial, axis: int = 0) -> Partial:
        """Order-preserving suffix scan: S_i = p_i ⊕ p_{i+1} ⊕ … ."""
        if not self.commutative:
            raise NotImplementedError(
                f"{self.name}: non-commutative monoid must override raccumulate"
            )
        return p_reverse(self.accumulate(p_reverse(p, axis), axis), axis)

    def reduce(self, p: Partial) -> Partial:
        """Fold a 1-D partial batch into a length-1 partial."""
        if p_len(p) == 0:
            return self.identity(1)
        acc = self.accumulate(p, axis=0)
        return p_take(acc, slice(-1, None))

    def lift_reduce(self, values: np.ndarray) -> Partial:
        return self.reduce(self.lift(np.asarray(values)))

    # --- scalar conveniences (tests / stepwise parity algorithms) ---
    def lift1(self, v) -> Partial:
        return self.lift(np.asarray([v]))

    def lower1(self, p: Partial):
        out = self.lower(p)
        return out[0] if getattr(out, "ndim", 0) else out


# ---------------------------------------------------------------------------
# Scalar monoids
# ---------------------------------------------------------------------------


class Sum(Monoid):
    """Windowed sum (cpp/src/AggregationFunctions.hpp:13-47); invertible."""

    name = "sum"
    invertible = True

    def __init__(self, dtype=np.float64):
        self.dtype = np.dtype(dtype)

    def lift(self, values):
        return {"v": np.asarray(values, dtype=self.dtype)}

    def identity(self, n=1):
        return {"v": np.zeros(n, dtype=self.dtype)}

    def combine(self, a, b):
        return {"v": a["v"] + b["v"]}

    def inverse_combine(self, a, b):
        return {"v": a["v"] - b["v"]}

    def lower(self, p):
        return p["v"]

    def accumulate(self, p, axis=0):
        return {"v": np.cumsum(p["v"], axis=axis, dtype=self.dtype)}


class Count(Sum):
    """Count = Sum over lift(row)=1 (the SURVEY §2.A turn-count lift)."""

    name = "count"

    def __init__(self):
        super().__init__(np.int64)

    def lift(self, values):
        return {"v": np.ones(len(np.asarray(values)), dtype=np.int64)}


class Max(Monoid):
    """Windowed max (cpp/src/AggregationFunctions.hpp:49-84); identity is the
    dtype's minimum (INT_MIN specialization at hpp:84)."""

    name = "max"
    idempotent = True

    def __init__(self, dtype=np.float64):
        self.dtype = np.dtype(dtype)
        self._id = (
            np.iinfo(self.dtype).min
            if np.issubdtype(self.dtype, np.integer)
            else -np.inf
        )

    def lift(self, values):
        return {"v": np.asarray(values, dtype=self.dtype)}

    def identity(self, n=1):
        return {"v": np.full(n, self._id, dtype=self.dtype)}

    def combine(self, a, b):
        return {"v": np.maximum(a["v"], b["v"])}

    def lower(self, p):
        return p["v"]

    def accumulate(self, p, axis=0):
        return {"v": np.maximum.accumulate(p["v"], axis=axis)}


class Min(Monoid):
    """Windowed min (dual of Max)."""

    name = "min"
    idempotent = True

    def __init__(self, dtype=np.float64):
        self.dtype = np.dtype(dtype)
        self._id = (
            np.iinfo(self.dtype).max
            if np.issubdtype(self.dtype, np.integer)
            else np.inf
        )

    def lift(self, values):
        return {"v": np.asarray(values, dtype=self.dtype)}

    def identity(self, n=1):
        return {"v": np.full(n, self._id, dtype=self.dtype)}

    def combine(self, a, b):
        return {"v": np.minimum(a["v"], b["v"])}

    def lower(self, p):
        return p["v"]

    def accumulate(self, p, axis=0):
        return {"v": np.minimum.accumulate(p["v"], axis=axis)}


class Mean(Monoid):
    """Windowed mean; Partial {sum, n}, 0-safe lower
    (cpp/src/AggregationFunctions.hpp:86-140)."""

    name = "mean"
    invertible = True

    def lift(self, values):
        v = np.asarray(values, dtype=np.float64)
        return {"sum": v, "n": np.ones(len(v), dtype=np.int64)}

    def identity(self, n=1):
        return {"sum": np.zeros(n), "n": np.zeros(n, dtype=np.int64)}

    def combine(self, a, b):
        return {"sum": a["sum"] + b["sum"], "n": a["n"] + b["n"]}

    def inverse_combine(self, a, b):
        return {"sum": a["sum"] - b["sum"], "n": a["n"] - b["n"]}

    def lower(self, p):
        with np.errstate(divide="ignore", invalid="ignore"):
            out = p["sum"] / p["n"]
        return np.where(p["n"] == 0, 0.0, out)  # lower of empty = Out() = 0

    def accumulate(self, p, axis=0):
        return {
            "sum": np.cumsum(p["sum"], axis=axis),
            "n": np.cumsum(p["n"], axis=axis),
        }


class GeometricMean(Monoid):
    """Geometric mean; Partial {Σlog (f64), n}; lower replicates the
    reference's float32 rounding exactly — ``expf((float)(Σlog/(float)n))``
    (cpp/src/AggregationFunctions.hpp:173-175)."""

    name = "geomean"
    invertible = True
    # inverse_combine is sound only for strictly positive inputs: a zero
    # lifts to logsum = −inf, and evicting it computes (−inf) − (−inf) =
    # NaN, permanently poisoning an SOE running total — so the auto
    # strategy must not pick SOE (two-stacks/block recompute from live
    # partials and recover after the zero leaves the window)
    soe_safe = False

    def lift(self, values):
        v = np.asarray(values, dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            logs = np.log(v)
        return {"logsum": logs, "n": np.ones(len(v), dtype=np.int64)}

    def identity(self, n=1):
        return {"logsum": np.zeros(n), "n": np.zeros(n, dtype=np.int64)}

    def combine(self, a, b):
        return {"logsum": a["logsum"] + b["logsum"], "n": a["n"] + b["n"]}

    def inverse_combine(self, a, b):
        return {"logsum": a["logsum"] - b["logsum"], "n": a["n"] - b["n"]}

    def lower(self, p):
        n = p["n"]
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            # double Σlog divided by FLOAT n, truncated to float, expf —
            # bit-matching hpp:173-175.
            t = (p["logsum"] / n.astype(np.float32)).astype(np.float32)
            geo = np.exp(t).astype(np.float32)
        return np.where(n == 0, np.float32(0.0), geo).astype(np.float64)

    def accumulate(self, p, axis=0):
        return {
            "logsum": np.cumsum(p["logsum"], axis=axis),
            "n": np.cumsum(p["n"], axis=axis),
        }


class SampleStdDev(Monoid):
    """Sample standard deviation; Partial {sum, sq, n}; lower uses the
    reference's naive sum-of-squares formula
    sqrt((sq − sum²/n)/(n−1)) (cpp/src/AggregationFunctions.hpp:229).

    With an integer dtype the partials are EXACT int64 (cents and cents²
    are ints), so prefix-difference folds stay bit-identical to the SQL
    oracle up to ~2^63 cumulative (≈3.8e9 rows/key at cents² ≈ 2.4e9) —
    vs float64 partials which lose exactness past 2^53 (~1e8 rows/key on
    hot keys at target scale). lower() converts to float64 only at the
    final formula, matching DuckDB's int-sum-then-double arithmetic."""

    name = "stddev"
    invertible = True

    def __init__(self, dtype=np.float64):
        self.dtype = (
            np.dtype(np.int64)
            if np.issubdtype(np.dtype(dtype), np.integer)
            else np.dtype(np.float64)
        )

    def lift(self, values):
        v = np.asarray(values, dtype=self.dtype)
        return {"sum": v, "sq": v * v, "n": np.ones(len(v), dtype=np.int64)}

    def identity(self, n=1):
        return {
            "sum": np.zeros(n, dtype=self.dtype),
            "sq": np.zeros(n, dtype=self.dtype),
            "n": np.zeros(n, dtype=np.int64),
        }

    def combine(self, a, b):
        return {
            "sum": a["sum"] + b["sum"],
            "sq": a["sq"] + b["sq"],
            "n": a["n"] + b["n"],
        }

    def inverse_combine(self, a, b):
        return {
            "sum": a["sum"] - b["sum"],
            "sq": a["sq"] - b["sq"],
            "n": a["n"] - b["n"],
        }

    def lower(self, p):
        n = p["n"].astype(np.float64)
        s = p["sum"].astype(np.float64)
        sq = p["sq"].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            var = (sq - (s * s) / n) / (n - 1.0)
            return np.sqrt(var)

    def accumulate(self, p, axis=0):
        return {
            "sum": np.cumsum(p["sum"], axis=axis),
            "sq": np.cumsum(p["sq"], axis=axis),
            "n": np.cumsum(p["n"], axis=axis),
        }


class ArgMax(Monoid):
    """Value whose lifted key is max; ties → the EARLIER (left) operand wins
    (``a.max >= b.max → a``, cpp/src/AggregationFunctions.hpp:297).
    Non-commutative because of the tie-break."""

    name = "argmax"
    # domain precondition: keys must be finite non-NaN (NaN keys freeze
    # the vectorized scans on the pre-NaN argmax while a combine() fold
    # would let later elements win; a key equal to the identity sentinel
    # −inf/INT64_MIN ties the identity and can surface its arg 0)
    commutative = False
    idempotent = True

    def __init__(self, arg_dtype=np.int64, key_dtype=np.float64):
        """``key_dtype=int64`` keeps surrogate keys exact above 2^53 —
        float64 keys (the default) silently lose integer precision there
        and the tie-break can diverge from an exact-integer SQL oracle
        (hit by cents·10^7 + event_id style keys at target scale)."""
        self.arg_dtype = np.dtype(arg_dtype)
        self.key_dtype = (
            np.dtype(np.int64)
            if np.issubdtype(np.dtype(key_dtype), np.integer)
            else np.dtype(np.float64)
        )
        self._key_id = (
            np.iinfo(np.int64).min if self.key_dtype == np.int64 else -np.inf
        )

    def lift(self, values):
        """values: structured — pass (args, keys) tuple or 2-col array."""
        args, keys = values
        return {
            "arg": np.asarray(args, dtype=self.arg_dtype),
            "key": np.asarray(keys, dtype=self.key_dtype),
        }

    def identity(self, n=1):
        # reference identity = {In(), Comparable()} i.e. zeros (hpp:315);
        # we use the key dtype's minimum (-inf / INT64_MIN) so empty loses
        # every comparison deterministically.
        return {
            "arg": np.zeros(n, dtype=self.arg_dtype),
            "key": np.full(n, self._key_id, dtype=self.key_dtype),
        }

    def combine(self, a, b):
        keep_a = a["key"] >= b["key"]
        return p_where(keep_a, a, b)

    def lower(self, p):
        return p["arg"]

    def _scan(self, p, axis, ties_new_wins):
        key = p["key"]
        cm = np.maximum.accumulate(key, axis=axis)
        prev = _shift_prev(cm, axis, self._key_id)
        new = (key >= prev) if ties_new_wins else (key > prev)
        # first element always "new"
        sl = [slice(None)] * key.ndim
        sl[axis] = 0
        new[tuple(sl)] = True
        ar_shape = [1] * key.ndim
        ar_shape[axis] = key.shape[axis]
        col = np.arange(key.shape[axis]).reshape(ar_shape)
        idx = np.where(new, col, -1)
        idx = np.maximum.accumulate(idx, axis=axis)
        arg = np.take_along_axis(p["arg"], idx, axis=axis)
        return {"arg": arg, "key": cm}

    def accumulate(self, p, axis=0):
        # prefix fold-left: on tie the earlier element wins → strict >
        return self._scan(p, axis, ties_new_wins=False)

    def raccumulate(self, p, axis=0):
        # suffix fold-left: earliest-in-original wins ⇒ in reversed order the
        # *later-seen* (i.e. earlier original) wins ties → >=
        rev = p_reverse(p, axis)
        return p_reverse(self._scan(rev, axis, ties_new_wins=True), axis)


class MinCount(Monoid):
    """Count of occurrences of the window min; Partial {n, min} with the
    n = −1 identity sentinel (cpp/src/AggregationFunctions.hpp:446-503)."""

    name = "mincount"
    # domain precondition: values must be non-NaN (NaN breaks the
    # min-equality count in the vectorized scan vs a combine() fold)

    def __init__(self, dtype=np.float64):
        self.dtype = np.dtype(dtype)
        self._minid = (
            np.iinfo(self.dtype).max
            if np.issubdtype(self.dtype, np.integer)
            else np.inf
        )

    def lift(self, values):
        v = np.asarray(values, dtype=self.dtype)
        return {"min": v, "n": np.ones(len(v), dtype=np.int64)}

    def identity(self, n=1):
        # reference identity = {-1, In()} (hpp:503); combine branches on n<0.
        return {"min": np.full(n, self._minid, dtype=self.dtype),
                "n": np.full(n, -1, dtype=np.int64)}

    def combine(self, a, b):
        a_id, b_id = a["n"] < 0, b["n"] < 0
        mn = np.minimum(a["min"], b["min"])
        n = np.where(
            a["min"] < b["min"], a["n"],
            np.where(a["min"] > b["min"], b["n"], a["n"] + b["n"]),
        )
        n = np.where(a_id, b["n"], np.where(b_id, a["n"], n))
        mn = np.where(a_id, b["min"], np.where(b_id, a["min"], mn))
        return {"min": mn, "n": n}

    def lower(self, p):
        return p["n"]

    def accumulate(self, p, axis=0):
        """Segment-scan: running min + running count of elements equal to it.

        Valid for partial batches with no identity sentinels (all lifted
        or combined real partials) — the only case kernels scan.
        """
        m, n = p["min"], p["n"]
        cm = np.minimum.accumulate(m, axis=axis)
        prev = _shift_prev(cm, axis, 0)  # fill irrelevant: col0 forced start
        is_start = cm < prev
        sl0 = [slice(None)] * m.ndim
        sl0[axis] = 0
        is_start[tuple(sl0)] = True
        contrib = n * (m == cm)
        cs = np.cumsum(contrib, axis=axis)
        base_at = cs - contrib  # prefix sum strictly before each position
        ar_shape = [1] * m.ndim
        ar_shape[axis] = m.shape[axis]
        col = np.arange(m.shape[axis]).reshape(ar_shape)
        sidx = np.maximum.accumulate(np.where(is_start, col, -1), axis=axis)
        base = np.take_along_axis(base_at, sidx, axis=axis)
        return {"min": cm, "n": cs - base}


class RelativeVariation(Monoid):
    """(max − min)/max; Partial {min, max}
    (cpp/src/AggregationFunctions.hpp:554-617)."""

    name = "relvar"
    idempotent = True

    def __init__(self, dtype=np.float64):
        self.dtype = np.dtype(dtype)
        if np.issubdtype(self.dtype, np.integer):
            self._lo, self._hi = np.iinfo(self.dtype).max, np.iinfo(self.dtype).min
        else:
            self._lo, self._hi = np.inf, -np.inf

    def lift(self, values):
        v = np.asarray(values, dtype=self.dtype)
        return {"min": v.copy(), "max": v.copy()}

    def identity(self, n=1):
        return {"min": np.full(n, self._lo, dtype=self.dtype),
                "max": np.full(n, self._hi, dtype=self.dtype)}

    def combine(self, a, b):
        return {"min": np.minimum(a["min"], b["min"]),
                "max": np.maximum(a["max"], b["max"])}

    def lower(self, p):
        # empty-window detection BEFORE the subtraction: the integer
        # identity sentinels would wrap (INT64_MIN − INT64_MAX = +1) and
        # return a tiny bogus ratio instead of the float dtype's NaN
        empty = p["max"] == self._hi
        mx = p["max"].astype(np.float64)
        mn = p["min"].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = (mx - mn) / mx
        return np.where(empty, np.nan, out)

    def accumulate(self, p, axis=0):
        return {"min": np.minimum.accumulate(p["min"], axis=axis),
                "max": np.maximum.accumulate(p["max"], axis=axis)}


# ---------------------------------------------------------------------------
# BloomFilter — bit-for-bit parity with the reference
# ---------------------------------------------------------------------------

# glibc rand() sequence after srand(1001): the reference salts its K=4 hash
# functions with exactly these draws (cpp/src/AggregationFunctions.hpp:367
# srand(1001) + 4× rand()). Computed once from glibc (TYPE_3 additive
# generator) and pinned here for platform-independent parity.
_BLOOM_SALTS = np.array(
    [469353932, 2078239751, 916013951, 1943028792], dtype=np.uint64
)


def _bloom_mix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """uint64 mixer, replicating cpp/src/AggregationFunctions.hpp:361-366."""
    a = a.astype(np.uint64, copy=False)
    b = b.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        i1 = b >> np.uint64(32)
        i2 = b & np.uint64((1 << 32) - 1)
        return (
            a
            ^ (a << np.uint64(7))
            ^ (i1 * (a >> np.uint64(3)))
            ^ (~((a << np.uint64(11)) + (i2 ^ (a >> np.uint64(5)))))
        )


class BloomFilter(Monoid):
    """Windowed Bloom membership sketch: N=4096 bits, K=4 salted hashes,
    combine = OR, lower = test(bit 0)
    (cpp/src/AggregationFunctions.hpp:321-377). Partial = (…, 64) uint64
    words (bit b lives at word b>>6, bit b&63 — word-packed so the OR
    scans touch 8× fewer elements than a byte layout)."""

    name = "bloom"
    idempotent = True
    NWORDS = 64  # 4096 bits

    def lift(self, values):
        v = np.asarray(values)
        # C++ casts In → size_t; replicate two's-complement for negatives
        v64 = v.astype(np.int64).astype(np.uint64)
        hv = _bloom_mix(np.full(len(v64), 101, dtype=np.uint64), v64)
        bits = np.zeros((len(v64), self.NWORDS), dtype=np.uint64)
        rows = np.arange(len(v64))
        one = np.uint64(1)
        for salt in _BLOOM_SALTS:
            h2 = _bloom_mix(hv, np.uint64(salt))
            pos = (h2 % np.uint64(4096)).astype(np.int64)
            np.bitwise_or.at(bits, (rows, pos >> 6), one << (pos & 63).astype(np.uint64))
        return {"bits": bits}

    def identity(self, n=1):
        return {"bits": np.zeros((n, self.NWORDS), dtype=np.uint64)}

    def combine(self, a, b):
        return {"bits": np.bitwise_or(a["bits"], b["bits"])}

    def lower(self, p):
        # lower = bitset.test(0) (hpp:347-350): bit 0 of word 0
        return (p["bits"][..., 0] & np.uint64(1)).astype(np.int64)

    def accumulate(self, p, axis=0):
        bits = p["bits"]
        # the scan axis is never the trailing word axis; a contiguous scan
        # along the LAST axis is ~5× faster than ufunc.accumulate's strided
        # walk, so move the scan axis last, copy, scan, move back
        t = np.ascontiguousarray(np.moveaxis(bits, axis, -1))
        np.bitwise_or.accumulate(t, axis=-1, out=t)
        return {"bits": np.ascontiguousarray(np.moveaxis(t, -1, axis))}


# ---------------------------------------------------------------------------
# HyperLogLog — distinct-count sketch (cardinality sibling of BloomFilter)
# ---------------------------------------------------------------------------

# 64 registers; rank capped at 55 (60-bit hash → 54 payload bits + "all
# zero"); alpha_m·m² pre-scaled by 2^55 so the harmonic sum stays an exact
# integer (≤ 64·2^55 = 2^61 < int64) and the ONLY float op in lower() is
# one correctly-rounded division — the same spec, constant for constant,
# as the SQL form in plans/pipeline_queries.py.
HLL_P = 6
HLL_M = 1 << HLL_P
HLL_RHO_CAP = 55
HLL_ALPHA_M2_SCALED = 0.709 * float(HLL_M * HLL_M) * float(1 << HLL_RHO_CAP)


class HyperLogLog(Monoid):
    """Windowed HyperLogLog distinct-count sketch — extends the reference's
    sketch family (BloomFilter is its membership sibling,
    cpp/src/AggregationFunctions.hpp:321-377) and demonstrates the §2
    contract: ANY associative operator slots into the window algorithms.

    Input is a PRECOMPUTED non-negative 60-bit hash (the engine computes
    md5-derived hashes JVM-side; the monoid never hashes per row).
    Partial = (…, 64) uint8 registers; combine = elementwise max
    (idempotent, commutative — Two-Stacks territory, not invertible);
    lower = the deterministic raw estimate."""

    name = "hll"
    idempotent = True
    # lane-max accumulate is ~6x slower than combine: doubling wins to ~256
    doubling_threshold = 256
    M = HLL_M

    def lift(self, values):
        h = np.asarray(values).astype(np.int64)
        n = len(h)
        b = (h % HLL_M).astype(np.int64)
        r = h >> HLL_P
        # rank = trailing zeros + 1: isolate lowest set bit (a power of two
        # ≤ 2^54, exact in float64) and take log2; r == 0 → cap
        low = (r & -r).astype(np.float64)
        rho = np.where(
            r == 0,
            np.int64(HLL_RHO_CAP),
            np.log2(np.maximum(low, 1.0)).astype(np.int64) + 1,
        ).astype(np.uint8)
        regs = np.zeros((n, HLL_M), dtype=np.uint8)
        regs[np.arange(n), b] = rho
        return {"regs": regs}

    def identity(self, n=1):
        return {"regs": np.zeros((n, HLL_M), dtype=np.uint8)}

    def combine(self, a, b):
        return {"regs": np.maximum(a["regs"], b["regs"])}

    def lower(self, p):
        s = (np.int64(1) << (HLL_RHO_CAP - p["regs"].astype(np.int64))).sum(axis=-1)
        return np.round(HLL_ALPHA_M2_SCALED / s.astype(np.float64), 4)

    def accumulate(self, p, axis=0):
        # same contiguous-scan trick as BloomFilter.accumulate
        t = np.ascontiguousarray(np.moveaxis(p["regs"], axis, -1))
        np.maximum.accumulate(t, axis=-1, out=t)
        return {"regs": np.ascontiguousarray(np.moveaxis(t, -1, axis))}


# ---------------------------------------------------------------------------
# Histogram quantile — the sketch family's quantile member
# ---------------------------------------------------------------------------

HISTQ_B = 64  # buckets
HISTQ_SHIFT = 10  # bucket width 2^10 (1024 cents ≈ $10) → covers 0..65535
HISTQ_PCT = 99  # the quantile, in integer percent (exact ceil arithmetic)


class HistogramQuantile(Monoid):
    """Windowed approximate quantile via a fixed-grid histogram — the
    quantile member of the sketch family (Bloom = membership, HLL =
    cardinality). Completes the trio AND is the first INVERTIBLE
    vector-partial monoid: combine = elementwise count addition, so
    SubtractOnEvict's O(1)-amortized fast path applies to a 64-lane
    partial exactly as it does to a scalar sum.

    Partial = (…, 64) int32 bucket counts (each counter is bounded by
    the rows it summarizes and every kernel accumulation scope is far
    below 2^31 — same width argument as CountMinSketch; the 64-lane
    vector partial is bandwidth-bound, so half the width is ~2x kernel
    throughput); bucket = min(max(v,0) >> 10,
    63); lower = the lower bound (bucket << 10) of the smallest bucket
    whose running count reaches ceil(pct·n/100) — all-integer arithmetic,
    bit-identical to the SQL spec by construction."""

    name = "histq"
    invertible = True
    # 64-lane int64 adds: measured doubling crossover ~128-256
    doubling_threshold = 128

    def lift(self, values):
        v = np.asarray(values).astype(np.int64)
        b = np.minimum(np.maximum(v, 0) >> HISTQ_SHIFT, HISTQ_B - 1)
        counts = np.zeros((len(v), HISTQ_B), dtype=np.int32)
        counts[np.arange(len(v)), b] = 1
        return {"counts": counts}

    def identity(self, n=1):
        return {"counts": np.zeros((n, HISTQ_B), dtype=np.int32)}

    def combine(self, a, b):
        return {"counts": a["counts"] + b["counts"]}

    def inverse_combine(self, a, b):
        return {"counts": a["counts"] - b["counts"]}

    def lower(self, p):
        counts = p["counts"]
        total = counts.sum(axis=-1)
        # ceil(pct·n / 100) in exact integers
        k = (HISTQ_PCT * total + (100 - 1)) // 100
        cum = np.cumsum(counts, axis=-1)
        idx = np.argmax(cum >= k[..., None], axis=-1)
        return (idx << HISTQ_SHIFT).astype(np.int64)

    def accumulate(self, p, axis=0):
        # axis-0 cumsum of a C-order (n, lanes) array walks column-strided
        # (lanes separate passes, each striding a full row apart) — move
        # the scan axis last so the scan runs over contiguous memory, as
        # BloomFilter.accumulate does (~6x on the 64-lane partial)
        t = np.ascontiguousarray(np.moveaxis(p["counts"], axis, -1))
        np.add.accumulate(t, axis=-1, out=t)
        return {"counts": np.ascontiguousarray(np.moveaxis(t, -1, axis))}


# Count-Min Sketch geometry: D hash rows × W counters, flattened to a
# (…, D·W) int64 partial. Row hashes are multiplicative (top-6-bit
# extraction of an odd-constant product — splitmix64-derived constants).
CMS_D = 4
CMS_W = 64
CMS_KS = (
    0x9E3779B97F4A7C15,
    0xBF58476D1CE4E5B9,
    0x94D049BB133111EB,
    0xD6E8FEB86659FD93,
)
CMS_QUERY = 1  # the pinned point-query item lower() estimates


def _cms_cols(v: np.ndarray) -> np.ndarray:
    """(len(v), D) counter columns; negative values hash via their
    two's-complement uint64 image (same convention as BloomFilter)."""
    u = np.asarray(v).astype(np.int64).astype(np.uint64)
    cols = np.empty((len(u), CMS_D), dtype=np.int64)
    for d, k in enumerate(CMS_KS):
        cols[:, d] = ((u * np.uint64(k)) >> np.uint64(64 - 6)).astype(np.int64)
    return cols


class CountMinSketch(Monoid):
    """Windowed Count-Min Sketch (Cormode & Muthukrishnan 2005) — the
    FREQUENCY member of the sketch family (Bloom = membership, HLL =
    cardinality, HistogramQuantile = quantiles): combine = elementwise
    counter addition, EXACTLY associative and invertible, so
    SubtractOnEvict's O(1)-amortized fast path applies to the
    (…, D·W) vector partial just as it does to a scalar sum.

    lower = the sketch's point estimate for ``query`` (min over the D
    rows of its counters) — an upper bound on the item's true window
    frequency, exact when no collision lands in all D rows.

    REGISTRY CONTRACT: unlike every other monoid, lower is a point query
    parameterized by ``query`` (default ``CMS_QUERY`` = 1); the ``"cms"``
    registry entry is pinned to that default, so a generic plan wiring
    ``"cms"`` gets frequency-of-1 unless it constructs
    ``CountMinSketch(query=item)`` itself. Driver queries feeding it
    therefore derive a value column whose domain makes item 1 meaningful
    (e.g. ``cents % 101 + 1``, echoing the reference's ``1 + (i % 101)``
    input stream, cpp/src/benchmark_core.h:115)."""

    name = "cms"
    invertible = True

    def __init__(self, query: int = CMS_QUERY):
        self.query = int(query)

    # int32 counters: every counter is bounded by the rows it summarizes
    # (one increment per lifted row), and every accumulation scope in the
    # kernels (window, batch block, per-key state) is far below 2^31 —
    # while the (n, 256) partial is the most bandwidth-hungry in the
    # registry, so halving its width is ~1.9x kernel throughput
    def lift(self, values):
        v = np.asarray(values).astype(np.int64)
        cols = _cms_cols(v)
        counts = np.zeros((len(v), CMS_D * CMS_W), dtype=np.int32)
        rows = np.arange(len(v))[:, None]
        counts[rows, np.arange(CMS_D)[None, :] * CMS_W + cols] = 1
        return {"counts": counts}

    def identity(self, n=1):
        return {"counts": np.zeros((n, CMS_D * CMS_W), dtype=np.int32)}

    def combine(self, a, b):
        return {"counts": a["counts"] + b["counts"]}

    def inverse_combine(self, a, b):
        return {"counts": a["counts"] - b["counts"]}

    def lower(self, p):
        q_cols = _cms_cols(np.asarray([self.query]))[0]
        idx = np.arange(CMS_D) * CMS_W + q_cols
        return p["counts"][..., idx].min(axis=-1).astype(np.int64)

    def accumulate(self, p, axis=0):
        # contiguous-scan layout (see HistogramQuantile.accumulate); the
        # in-place ufunc accumulate keeps the int32 dtype, pinning the
        # result against numpy's platform cumsum promotion
        t = np.ascontiguousarray(np.moveaxis(p["counts"], axis, -1))
        np.add.accumulate(t, axis=-1, out=t)
        return {"counts": np.ascontiguousarray(np.moveaxis(t, -1, axis))}


# ---------------------------------------------------------------------------
# Collect — the order-sensitivity witness (object-array partials; test paths)
# ---------------------------------------------------------------------------


def _obj_array(items) -> np.ndarray:
    out = np.empty(len(items), dtype=object)
    for i, it in enumerate(items):
        out[i] = it
    return out


class Collect(Monoid):
    """Windowed order-preserving list of values
    (cpp/src/AggregationFunctions.hpp:379-443). Partials are tuples in
    object arrays; used as the ORDER WITNESS in tests, not in hot paths
    (kernels special-case collect: the window contents ARE the answer)."""

    name = "collect"
    commutative = False
    invertible = True  # inverse_combine removes elements (hpp:426)
    scan2d = False  # accumulate is 1-D-only → kernels dispatch two-stacks

    def lift(self, values):
        return {"ls": _obj_array([(v,) for v in np.asarray(values).tolist()])}

    def identity(self, n=1):
        return {"ls": _obj_array([()] * n)}

    def combine(self, a, b):
        av, bv = a["ls"], b["ls"]
        av, bv = np.broadcast_arrays(av, bv)
        return {"ls": _obj_array([x + y for x, y in zip(av.tolist(), bv.tolist())])}

    def inverse_combine(self, a, b):
        # list.remove semantics: drop first occurrence of each item of b
        out = []
        for x, y in zip(a["ls"].tolist(), np.broadcast_to(b["ls"], a["ls"].shape).tolist()):
            lx = list(x)
            for item in y:
                lx.remove(item)
            out.append(tuple(lx))
        return {"ls": _obj_array(out)}

    def lower(self, p):
        return _obj_array([list(t) for t in p["ls"].tolist()])

    def accumulate(self, p, axis=0):
        if p["ls"].ndim != 1:
            raise NotImplementedError("collect accumulate is 1-D (test-only)")
        acc, out = (), []
        for t in p["ls"].tolist():
            acc = acc + t
            out.append(acc)
        return {"ls": _obj_array(out)}

    def raccumulate(self, p, axis=0):
        if p["ls"].ndim != 1:
            raise NotImplementedError
        acc, out = (), []
        for t in reversed(p["ls"].tolist()):
            acc = t + acc
            out.append(acc)
        return {"ls": _obj_array(out[::-1])}


class BusyLoop(Monoid):
    """Synthetic CPU-heavy combine for benchmark stressing
    (cpp/src/AggregationFunctions.hpp:505-552). Bench payload only."""

    name = "busyloop"
    # the busy-work combine is deliberately not invertible (a − b does not
    # undo combine's extra +busy(s)); values are an anti-DCE payload, but
    # keep SOE off so cross-strategy comparisons stay meaningful
    soe_safe = False
    invertible = True

    def lift(self, values):
        return {"v": np.asarray(values, dtype=np.int64)}

    def identity(self, n=1):
        return {"v": np.zeros(n, dtype=np.int64)}

    @staticmethod
    def _busy(num_loop: np.ndarray) -> np.ndarray:
        out = np.empty(len(num_loop), dtype=np.int64)
        for i, nl in enumerate(num_loop):  # bench payload: intentionally heavy
            dummy = 1.0
            for j in range(int(nl)):
                dummy += 1.0 / ((1 + j) % 1000000)
            out[i] = int(dummy)
        return out

    def combine(self, a, b):
        s = a["v"] + b["v"]
        num_loop = 100 + (s % 11)
        return {"v": s + self._busy(np.atleast_1d(num_loop)) % 16}

    def inverse_combine(self, a, b):
        return {"v": a["v"] - b["v"]}

    def lower(self, p):
        return p["v"]

    def accumulate(self, p, axis=0):
        v = p["v"]
        if v.ndim != 1:
            raise NotImplementedError
        out = np.empty_like(v)
        acc = None
        for i in range(len(v)):
            acc = v[i] if acc is None else int(
                self.combine({"v": np.array([acc])}, {"v": v[i : i + 1]})["v"][0]
            )
            out[i] = acc
        return {"v": out}


# ---------------------------------------------------------------------------
# Time-decayed sum — the timestamped monoid (half-life metrics)
# ---------------------------------------------------------------------------

DECAY_T_SHIFT = 40  # packed input: (time_unit << 40) | value, value < 2^40


class DecayedSum(Monoid):
    """Exponentially time-decayed sum — the textbook construction that
    makes a decaying metric associative (the timestamped-monoid idea the
    reference applies to window bounds, cpp/src/TimestampedFifo.hpp,
    turned into the AGGREGATE itself): each element contributes
    ``v · 2^(t − tip)`` where ``tip`` is the window's newest time unit,
    i.e. a half-life of exactly one time unit (callers pick granularity
    by quantizing timestamps — e.g. 6-hour units ≈ 16× decay/day).

    Partial = ``{s: float64 decayed sum referenced to time t, t: int64
    reference tip}``; combine re-references both sides to ``max(t1, t2)``
    by ``np.ldexp`` — scaling by powers of two is EXACT in IEEE754, so
    associativity/commutativity hold bit-for-bit as long as the window's
    time spread keeps terms inside float64's 52-bit span (the engine's
    exactness discipline: integer cents × power-of-2 decay = dyadic
    rationals; a 6h-unit query over day-scale windows has total bit
    spread ≈ value_bits + unit_spread ≪ 52, so Spark and DuckDB agree
    hash-exactly with no rounding). Identity = {0, −2^62 sentinel} (the
    MinCount n=−1 pattern); the scan is a cumsum of batch-referenced
    terms rescaled per prefix — bit-identical to the sequential fold
    because every operand differs only by a shared exact 2^k factor.

    Input is PACKED into one int64 (``time_unit << 40 | value``, the
    argmax packed-key discipline) so the monoid stays single-column and
    slots into every kernel/stream path unmodified."""

    name = "decayed"
    commutative = True
    invertible = False
    _NEG = np.int64(-(np.int64(1) << np.int64(62)))

    @staticmethod
    def _exp(e):
        # ldexp wants int32; clip keeps sentinel arithmetic finite (a
        # clipped exponent only ever applies to s == 0 or to terms the
        # true fold also decays past float64's subnormal floor)
        return np.clip(e, -1100, 1100).astype(np.int32)

    def lift(self, values):
        v = np.asarray(values).astype(np.int64)
        t = v >> DECAY_T_SHIFT
        s = (v & ((np.int64(1) << np.int64(DECAY_T_SHIFT)) - 1)).astype(
            np.float64
        )
        return {"s": s, "t": t}

    def identity(self, n=1):
        return {
            "s": np.zeros(n, dtype=np.float64),
            "t": np.full(n, self._NEG, dtype=np.int64),
        }

    def combine(self, a, b):
        t1, t2 = a["t"], b["t"]
        tip = np.maximum(t1, t2)
        s = np.ldexp(a["s"], self._exp(t1 - tip)) + np.ldexp(
            b["s"], self._exp(t2 - tip)
        )
        return {"s": s, "t": tip}

    def lower(self, p):
        return p["s"]

    def accumulate(self, p, axis=0):
        t, s = p["t"], p["s"]
        tip = np.maximum.accumulate(t, axis=axis)
        ref = np.max(t, axis=axis, keepdims=True)  # batch reference
        c = np.ldexp(s, self._exp(t - ref))
        cs = np.cumsum(c, axis=axis)
        return {"s": np.ldexp(cs, self._exp(ref - tip)), "t": tip}


# ---------------------------------------------------------------------------
# TopK — sliding order statistic (k-th largest over the window)
# ---------------------------------------------------------------------------


class TopK(Monoid):
    """The k LARGEST values in the window as an associative aggregate —
    the order-statistic member of the §2.A contract (any associative
    operator slots into every window algorithm, the same extension
    pattern as ArgMax/Collect, cpp/src/AggregationFunctions.hpp:297).

    Partial = ``{"top": (…, k) int64}``, lanes sorted ASCENDING, missing
    slots padded with the INT64_MIN sentinel (the MinCount n=−1
    discipline). ``combine`` is a rowwise 2k-merge: lane-concat, sort,
    keep the upper k — the top-k of a multiset union depends only on the
    union, so the operator is associative AND commutative; it is NOT
    idempotent (``combine(a, a)`` duplicates survivors — faithful
    multiset semantics) and NOT invertible, so it exercises the
    Two-Stacks/DABA family on a vector domain like bloom/hll.

    ``lower`` = lane 0 = the k-th largest value in the window, emitting
    the sentinel while the window holds fewer than k values — exactly
    reproducible in SQL (``coalesce(sorted_list[k], sentinel)``), which
    keeps the DuckDB oracle hash-exact. ``accumulate`` has no numpy
    ufunc, so the prefix scan is a Hillis–Steele doubling scan:
    ``ceil(log2 n)`` shifted combines, each a vectorized 2k-sort — the
    same log-combine economics as the engine's small-window fold path.
    """

    name = "top3"
    commutative = True
    invertible = False
    SENTINEL = np.int64(np.iinfo(np.int64).min)

    def __init__(self, k: int = 3, dtype=np.float64):
        self.k = int(k)
        self.name = f"top{self.k}"

    def lift(self, values):
        v = np.asarray(values).astype(np.int64)
        top = np.full((len(v), self.k), self.SENTINEL, dtype=np.int64)
        top[:, -1] = v
        return {"top": top}

    def identity(self, n=1):
        return {"top": np.full((n, self.k), self.SENTINEL, dtype=np.int64)}

    def combine(self, a, b):
        cat = np.concatenate([a["top"], b["top"]], axis=-1)
        cat.sort(axis=-1)
        return {"top": np.ascontiguousarray(cat[..., -self.k:])}

    def lower(self, p):
        return p["top"][..., 0]

    def _shifted(self, arr: np.ndarray, axis: int, shift: int) -> np.ndarray:
        """arr shifted forward by ``shift`` along ``axis``, identity fill."""
        out = np.full_like(arr, self.SENTINEL)
        src = [slice(None)] * arr.ndim
        dst = [slice(None)] * arr.ndim
        src[axis] = slice(0, arr.shape[axis] - shift)
        dst[axis] = slice(shift, None)
        out[tuple(dst)] = arr[tuple(src)]
        return out

    def accumulate(self, p, axis=0):
        out = p["top"]
        n = out.shape[axis]
        shift = 1
        while shift < n:
            out = self.combine(
                {"top": self._shifted(out, axis, shift)}, {"top": out}
            )["top"]
            shift <<= 1
        return {"top": out}


# ---------------------------------------------------------------------------
# CEP pattern matching as a monoid: DFA transition composition
# ---------------------------------------------------------------------------


class Dfa:
    """A deterministic finite automaton spec: ``delta`` is the (S, A)
    transition table (state × symbol → state), ``accept`` the accepting
    state set, ``q0`` the start state. Plain data — the monoid below does
    the work."""

    def __init__(self, delta: np.ndarray, accept, q0: int = 0):
        delta = np.asarray(delta, dtype=np.uint8)
        if delta.ndim != 2 or delta.shape[0] > 255:
            raise ValueError("delta must be (S<=255, A)")
        if (delta >= delta.shape[0]).any():
            raise ValueError("delta targets out of range")
        self.delta = delta
        self.nstates, self.alphabet = delta.shape
        self.accept = frozenset(int(s) for s in accept)
        self.q0 = int(q0)


def dfa_run(symbol: int, k: int, alphabet: int) -> Dfa:
    """DFA accepting any sequence containing ≥k CONSECUTIVE occurrences
    of ``symbol`` (the CEP "tool loop" / retry-storm detector). States
    0..k = current trailing-run length capped at k; state k is absorbing
    (once seen, the window matched)."""
    delta = np.zeros((k + 1, alphabet), dtype=np.uint8)
    for s in range(k):
        delta[s, :] = 0
        delta[s, symbol] = s + 1
    delta[k, :] = k  # absorbing accept
    return Dfa(delta, accept={k})


def dfa_contains(pattern, alphabet: int) -> Dfa:
    """DFA accepting any sequence containing ``pattern`` as a CONTIGUOUS
    substring (the CEP funnel / episode detector), via the classic KMP
    prefix-function automaton; state m = len(pattern) is absorbing."""
    pat = [int(p) for p in pattern]
    m = len(pat)
    if m == 0:
        raise ValueError("empty pattern")
    # failure links
    fail = [0] * m
    for i in range(1, m):
        j = fail[i - 1]
        while j and pat[i] != pat[j]:
            j = fail[j - 1]
        fail[i] = j + 1 if pat[i] == pat[j] else 0
    delta = np.zeros((m + 1, alphabet), dtype=np.uint8)
    for s in range(m):
        for a in range(alphabet):
            if a == pat[s]:
                delta[s, a] = s + 1
            else:
                j = s
                while j and pat[j] != a:
                    j = fail[j - 1]
                delta[s, a] = j + 1 if pat[j] == a else 0
    delta[m, :] = m  # absorbing accept
    return Dfa(delta, accept={m})


class DfaTransform(Monoid):
    """CEP pattern matching lifted to a sliding-window monoid: the partial
    for a symbol run is its DFA transition FUNCTION (state → state), and
    ``combine`` is function composition — associative but not commutative
    or invertible, so this rides the Two-Stacks/DABA family exactly like
    Max/Collect do (the reference's §2 contract: ANY associative operator
    slots into every window algorithm, cpp/src/AggregationFunctions.hpp's
    Recalc/TwoStacks genericity). This is the "parallel prefix automata"
    construction (Ladner–Fischer; MATCH_RECOGNIZE-style CEP reduced to an
    associative fold): a window matches a regular pattern iff the
    composed transition function sends q0 into an accepting state.

    Two partial representations, chosen at construction:

    - PACKED (the fast path, taken whenever the DFA's transition monoid
      — identity + all products of the per-symbol generator functions —
      enumerates to ≤ _PACK_CAP elements, which for real CEP automata is
      O(S·A), e.g. 12 for both registry instances): a partial is a
      single uint16 ELEMENT CODE and combine is one (M, M)
      composition-table gather per element — scalar-monoid speed
      (~10× the vector path at w=64 on the kernel grid).
    - VECTOR (fallback): (…, S) uint8 ``f`` with ``f[..., s]`` = end
      state when starting from ``s``; combine = take_along_axis gather.

    In both, combine(a, b) = b∘a (a applied FIRST — window order) and
    identity = the identity function. ``lift`` totalizes arbitrary
    integer inputs by reducing mod the alphabet size (so the generic
    lockstep/kernel grids exercise it unmodified); ``lower`` returns the
    end state from ``q0`` (callers map acceptance via
    ``accepts``/``np.isin``). Scans are Hillis–Steele doubling —
    log₂(n) vectorized gathers, valid for any associative op."""

    name = "dfa"
    commutative = False
    invertible = False
    idempotent = False
    # packed combines are single-lane table gathers — cheaper than the
    # block scans' materializations well past the generic crossover
    doubling_threshold = 128

    # enumeration cap for the packed representation: real CEP automata
    # (run-length, KMP) have transition monoids of O(S·A) elements; an
    # adversarial DFA could approach S^S, where the composition table
    # stops fitting in cache — fall back to the vector path there
    _PACK_CAP = 4096

    def __init__(self, dfa: Dfa | None = None):
        self.dfa = dfa if dfa is not None else dfa_run(2, 3, 5)
        S, A = self.dfa.nstates, self.dfa.alphabet
        self._S = S
        # Enumerate the DFA's transition monoid: identity + all products
        # of the per-symbol generator functions, closed under
        # right-composition (BFS). Every lift output is a generator and
        # every combine of products is a product, so the set is closed —
        # partials become uint16 ELEMENT CODES and combine a single
        # (M, M) table gather.
        ident = tuple(range(S))
        gens = [tuple(int(x) for x in self.dfa.delta[:, a]) for a in range(A)]
        elems: dict = {ident: 0}
        queue = [ident]
        while queue and len(elems) <= self._PACK_CAP:
            nxt = []
            for f in queue:
                for g in gens:
                    h = tuple(g[f[s]] for s in range(S))  # f then g
                    if h not in elems:
                        elems[h] = len(elems)
                        nxt.append(h)
            queue = nxt
        self._packed = len(elems) <= self._PACK_CAP
        if self._packed:
            M = len(elems)
            funcs = np.zeros((M, S), dtype=np.uint8)
            for f, i in elems.items():
                funcs[i] = f
            # comp[a, b] = code of (a then b): h[a,b,s] = funcs[b, funcs[a,s]]
            hab = funcs[np.arange(M)[None, :, None], funcs[:, None, :]]
            flat = hab.reshape(M * M, S)
            index = {funcs[i].tobytes(): i for i in range(M)}
            table = np.empty(M * M, dtype=np.uint16)
            for j in range(M * M):
                table[j] = index[flat[j].tobytes()]
            self._funcs = funcs
            self._table = table.reshape(M, M)
            self._gen_code = np.array([elems[g] for g in gens], dtype=np.uint16)

    # --- packed representation: partial = (…,) uint16 monoid-element code
    def lift(self, values):
        sym = np.asarray(values).astype(np.int64) % self.dfa.alphabet
        if self._packed:
            return {"c": self._gen_code[sym]}
        # vector fallback: delta[:, sym] is (S, n) → transpose to (n, S)
        return {"f": np.ascontiguousarray(self.dfa.delta[:, sym].T)}

    def identity(self, n=1):
        if self._packed:
            return {"c": np.zeros(n, dtype=np.uint16)}  # code 0 = identity
        eye = np.arange(self._S, dtype=np.uint8)
        return {"f": np.tile(eye, (n, 1))}

    def combine(self, a, b):
        if self._packed:
            return {"c": self._table[a["c"], b["c"]]}
        av, bv = np.broadcast_arrays(a["f"], b["f"])
        # (b ∘ a)[s] = b[a[s]] — a acts first (earlier window rows);
        # uint8 indices feed take_along_axis directly (the intp upcast
        # copy costs ~1.5× on this 4-byte-row gather)
        return {"f": np.take_along_axis(bv, av, axis=-1)}

    def lower(self, p):
        if self._packed:
            return self._funcs[p["c"], self.dfa.q0].astype(np.int64)
        return p["f"][..., self.dfa.q0].astype(np.int64)

    def accepts(self, states: np.ndarray) -> np.ndarray:
        return np.isin(states, list(self.dfa.accept))

    def _scan(self, p, axis, suffix: bool):
        if self._packed:
            c = np.moveaxis(np.array(p["c"], copy=True), axis, 0)
            n = c.shape[0]
            d = 1
            while d < n:
                if suffix:
                    c[:-d] = self._table[c[:-d], c[d:]]
                else:
                    c[d:] = self._table[c[:-d], c[d:]]
                d *= 2
            return {"c": np.ascontiguousarray(np.moveaxis(c, 0, axis))}
        f = np.moveaxis(np.array(p["f"], copy=True), axis, 0)
        n = f.shape[0]
        d = 1
        while d < n:
            if suffix:
                # S_i = S_i ∘-then S_{i+d}: earlier block (S_i) acts first
                f[:-d] = np.take_along_axis(f[d:], f[:-d], axis=-1)
            else:
                # A_i = A_{i-d} then A_i
                f[d:] = np.take_along_axis(f[d:], f[:-d], axis=-1)
            d *= 2
        return {"f": np.ascontiguousarray(np.moveaxis(f, 0, axis))}

    def accumulate(self, p, axis=0):
        return self._scan(p, axis, suffix=False)

    def raccumulate(self, p, axis=0):
        return self._scan(p, axis, suffix=True)


# ---------------------------------------------------------------------------
# MinHash signature — rolling content fingerprint over the window
# ---------------------------------------------------------------------------

# 8 pinned lane salts (arbitrary odd 32-bit constants, literal in both the
# NumPy mixer and the DuckDB HUGEINT oracle — the _BLOOM_SALTS discipline)
_MINHASH_SALTS = np.array(
    [
        2654435769,
        40503,
        2246822519,
        3266489917,
        668265263,
        374761393,
        3069313229,
        591751049,
    ],
    dtype=np.uint64,
)


class MinHashSig(Monoid):
    """Windowed MinHash signature: L=8 lanes, lane l = min over the window
    of ``mix(mix(101, v), salt_l)`` — the same uint64 mixer family as the
    reference's BloomFilter (cpp/src/AggregationFunctions.hpp:361-366), so
    the SQL oracle reuses the verified HUGEINT rendering. Extends the
    sketch family (bloom = membership, hll = cardinality, histq =
    quantile, cms = frequency) with SET-SIMILARITY: two windows'
    signatures estimate Jaccard overlap by lane agreement, which is the
    streaming twin of the batch MinHash-LSH dedup pipeline
    (plans/text_queries.py) — a per-conversation ROLLING content
    fingerprint for near-dup / drift detection on the transcript stream.

    Partial = ``{"sig": (…, 8) uint64}``; combine = elementwise min —
    idempotent, commutative, NOT invertible (Two-Stacks/DABA territory,
    and eligible for overlapping sparse-table range folds like max/hll).
    ``lower`` = lane 0 reinterpreted as int64 (two's complement, exactly
    what ``cast(hugeint_min - 2^64*(…≥2^63) as bigint)`` yields in SQL);
    the identity (empty window) lowers to −1 = all-ones uint64."""

    name = "minhash"
    idempotent = True
    L = 8

    def lift(self, values):
        v = np.asarray(values)
        v64 = v.astype(np.int64).astype(np.uint64)
        hv = _bloom_mix(np.full(len(v64), 101, dtype=np.uint64), v64)
        sig = np.empty((len(v64), self.L), dtype=np.uint64)
        for i, salt in enumerate(_MINHASH_SALTS):
            sig[:, i] = _bloom_mix(hv, salt)
        return {"sig": sig}

    def identity(self, n=1):
        return {"sig": np.full((n, self.L), np.uint64(2**64 - 1), dtype=np.uint64)}

    def combine(self, a, b):
        return {"sig": np.minimum(a["sig"], b["sig"])}

    def lower(self, p):
        return np.ascontiguousarray(p["sig"][..., 0]).view(np.int64)

    def accumulate(self, p, axis=0):
        # same contiguous-scan trick as BloomFilter.accumulate
        t = np.ascontiguousarray(np.moveaxis(p["sig"], axis, -1))
        np.minimum.accumulate(t, axis=-1, out=t)
        return {"sig": np.ascontiguousarray(np.moveaxis(t, -1, axis))}

    def jaccard(self, a: Partial, b: Partial) -> np.ndarray:
        """Estimated Jaccard similarity between two windows = fraction of
        agreeing lanes (the consumer-side API; not part of the fold)."""
        return (a["sig"] == b["sig"]).mean(axis=-1)


# ---------------------------------------------------------------------------
# AdjacentSum — lag-1 product sum (autocovariance numerator)
# ---------------------------------------------------------------------------


class AdjacentSum(Monoid):
    """Sum of ADJACENT-pair products over the window:
    ``Σ_{i=2..n} v_{i-1}·v_i`` — the lag-1 autocovariance/autocorrelation
    numerator (volatility clustering, signal smoothness) as an associative
    aggregate. The classic segment-concatenation monoid: partial =
    ``(first, last, adj, n)``; ``combine(a, b)`` keeps ``a.first`` /
    ``b.last`` and bridges the seam with ``a.last · b.first``:

        adj' = a.adj + b.adj + [a.n>0][b.n>0]·a.last·b.first

    Associative but NOT commutative (order of concatenation matters) and
    NOT invertible — it rides Two-Stacks/DABA/FlatFIT like dfa/collect
    do, exercising the non-commutative contract on a numeric domain.
    Exact int64 throughout (cents ≤ ~1e7 → pair product ≤ 1e14, window
    sum ≤ 1e16 ≪ 2^63), so the SQL oracle
    (``sum(cents·lag(cents)) over (rows 98 preceding)``) is hash-exact.
    ``lower`` = adj. Scans are Hillis–Steele doubling (no ufunc for the
    seam term), the DfaTransform/TopK discipline."""

    name = "adjsum"
    commutative = False
    invertible = False

    def lift(self, values):
        v = np.asarray(values).astype(np.int64)
        return {
            "f": v.copy(),
            "l": v.copy(),
            "s": np.zeros_like(v),
            "n": np.ones_like(v),
        }

    def identity(self, n=1):
        z = np.zeros(n, dtype=np.int64)
        return {"f": z, "l": z.copy(), "s": z.copy(), "n": z.copy()}

    def combine(self, a, b):
        an, bn = np.broadcast_arrays(a["n"], b["n"])
        af, bf = np.broadcast_arrays(a["f"], b["f"])
        al, bl = np.broadcast_arrays(a["l"], b["l"])
        as_, bs = np.broadcast_arrays(a["s"], b["s"])
        both = (an > 0) & (bn > 0)
        return {
            "f": np.where(an > 0, af, bf),
            "l": np.where(bn > 0, bl, al),
            "s": as_ + bs + np.where(both, al * bf, 0),
            "n": an + bn,
        }

    def lower(self, p):
        return p["s"]

    def _scan(self, p, axis, suffix: bool):
        out = {k: np.array(v, copy=True) for k, v in p.items()}
        n = out["s"].shape[axis]
        d = 1
        while d < n:
            shifted = {
                k: _shift_prev_by(v, axis, -d if suffix else d, self.identity(1)[k][0])
                for k, v in out.items()
            }
            out = self.combine(out, shifted) if suffix else self.combine(shifted, out)
            d <<= 1
        return out

    def accumulate(self, p, axis=0):
        return self._scan(p, axis, suffix=False)

    def raccumulate(self, p, axis=0):
        return self._scan(p, axis, suffix=True)


def _shift_prev_by(arr: np.ndarray, axis: int, shift: int, fill) -> np.ndarray:
    """``arr`` shifted by ``shift`` along ``axis`` (positive = forward),
    vacated slots identity-filled — the doubling-scan shim."""
    out = np.full_like(arr, fill)
    n = arr.shape[axis]
    src = [slice(None)] * arr.ndim
    dst = [slice(None)] * arr.ndim
    if shift >= 0:
        src[axis] = slice(0, n - shift)
        dst[axis] = slice(shift, None)
    else:
        src[axis] = slice(-shift, None)
        dst[axis] = slice(0, n + shift)
    out[tuple(dst)] = arr[tuple(src)]
    return out


# ---------------------------------------------------------------------------
# Trend — rolling OLS slope numerator (position-weighted sum monoid)
# ---------------------------------------------------------------------------


class Trend(Monoid):
    """Rolling OLS trend numerator: for the window ``v_0..v_{n-1}`` (in
    arrival order, 0-based positions) lower to

        n·Σ i·v_i − (Σi)·(Σv)  =  n²·cov(i, v)

    — the exact-integer numerator of the least-squares slope (its sign is
    the direction of the trend; divide by the position-only denominator
    ``n·Σi² − (Σi)²`` downstream for the slope itself). Positions are
    IMPLICIT: ``lift`` is single-column (n=1, s=v, w=0) and the
    position-weighted sum ``w = Σ local_i·v_i`` emerges from the combine's
    shift term

        w' = a.w + b.w + a.n·b.s

    (concatenating ``b`` after ``a`` shifts b's local indices by a.n) —
    the same segment-concatenation idea as AdjacentSum, but INVERTIBLE:
    prefix removal is closed-form (``inverse_combine(c, a)`` solves
    ``c = a⊕b`` for ``b``), so Trend is the engine's first invertible
    NON-commutative monoid — it rides SubtractOnEvict
    (cpp/src/SubtractOnEvict.hpp:20-64) on a partial whose group inverse
    is position-dependent, a case the sum/mean/stddev family never
    exercises. Exact int64 throughout (cents ≤ 1e7, w = 100 → |lower| ≤
    n²·w·v ≈ 1e13 ≪ 2^63), so the SQL oracle is hash-exact.

    Both scans are closed-form single-pass cumsums (no doubling needed):
    prefix ``W_k = Σ_{j≤k} (w_j + N_{j-1}·s_j)`` and suffix
    ``W'_j = Σ_{i≥j} (w_i + n_i·(S'_i − s_i))`` with ``N``/``S'`` the
    running count/value sums.

    Interval-fold routing note: the prefix-diff fold would be CORRECT
    for Trend (``inverse_combine`` is exactly prefix removal), but a
    whole-segment prefix's ``w`` term grows QUADRATICALLY
    (``≈ B²·v/2``), wrapping int64 near ~30k rows/key at max cents —
    so interval_fold deliberately keeps Trend on the disjoint sparse
    table, whose combines never leave the (bounded) queried windows."""

    name = "trend"
    invertible = True
    commutative = False

    def lift(self, values):
        v = np.asarray(values).astype(np.int64)
        return {"n": np.ones_like(v), "s": v.copy(), "w": np.zeros_like(v)}

    def identity(self, n=1):
        z = np.zeros(n, dtype=np.int64)
        return {"n": z, "s": z.copy(), "w": z.copy()}

    def combine(self, a, b):
        return {
            "n": a["n"] + b["n"],
            "s": a["s"] + b["s"],
            "w": a["w"] + b["w"] + a["n"] * b["s"],
        }

    def inverse_combine(self, c, a):
        # remove the time-order PREFIX a from c (the SubtractOnEvict /
        # prefix-diff contract): b with c = a⊕b
        bs = c["s"] - a["s"]
        return {
            "n": c["n"] - a["n"],
            "s": bs,
            "w": c["w"] - a["w"] - a["n"] * bs,
        }

    def lower(self, p):
        n, s, w = p["n"], p["s"], p["w"]
        return n * w - (n * (n - 1) // 2) * s

    def accumulate(self, p, axis=0):
        n = np.cumsum(p["n"], axis=axis)
        s = np.cumsum(p["s"], axis=axis)
        # N_{j-1} = count of elements before j = cumsum(n) - n
        w = np.cumsum(p["w"] + (n - p["n"]) * p["s"], axis=axis)
        return {"n": n, "s": s, "w": w}

    def raccumulate(self, p, axis=0):
        def rcs(a):
            return np.flip(np.cumsum(np.flip(a, axis), axis=axis), axis)

        n = rcs(p["n"])
        s = rcs(p["s"])
        # W'_j = w_j + n_j·S'_{j+1} + W'_{j+1}  with  S'_{j+1} = S'_j − s_j
        w = rcs(p["w"] + p["n"] * (s - p["s"]))
        return {"n": n, "s": s, "w": w}


# ---------------------------------------------------------------------------
# ToolSet — exact small-domain windowed distinct count (bitset-OR)
# ---------------------------------------------------------------------------

# 8-bit popcount lookup (numpy < 2.0 has no bitwise_count ufunc)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


class ToolSet(Monoid):
    """Exact distinct count over a SMALL categorical domain: lift maps the
    value to a single-bit uint64 mask (``1 << (v mod 63)`` — bits 0..62
    only, so the int64 reinterpretation stays non-negative and the SQL
    oracle's BIGINT ``bit_or`` never touches the sign bit), combine is
    bitwise OR, lower is the popcount = the exact number of distinct
    categories seen in the window. The transcript-schema use is "distinct
    tools invoked in the last w turns" (input_hint's ``tool`` column;
    domain ≤ 63 → exact, the complement of HyperLogLog's approximate
    unbounded-domain count). Idempotent + commutative and NOT invertible
    (Two-Stacks/DABA territory, eligible for overlapping sparse-table
    range folds like max/bloom/hll/minhash). Oracle:
    ``bit_count(bit_or(1 << (v % 63)) over w)`` — DuckDB mirrors the
    monoid operation exactly."""

    name = "toolset"
    idempotent = True

    def lift(self, values):
        v = np.asarray(values).astype(np.int64).astype(np.uint64)
        return {"bits": np.uint64(1) << (v % np.uint64(63))}

    def identity(self, n=1):
        return {"bits": np.zeros(n, dtype=np.uint64)}

    def combine(self, a, b):
        return {"bits": a["bits"] | b["bits"]}

    def lower(self, p):
        b = np.ascontiguousarray(p["bits"])
        cnt = _POP8[b.view(np.uint8)].reshape(b.shape + (8,)).sum(axis=-1)
        return cnt.astype(np.int64)

    def accumulate(self, p, axis=0):
        return {"bits": np.bitwise_or.accumulate(p["bits"], axis=axis)}


# ---------------------------------------------------------------------------
# MaxRun / MaxGap — the prefix/suffix/best segment monoids
# ---------------------------------------------------------------------------


class _DoublingScanMixin:
    """Hillis–Steele doubling scans for segment-concatenation monoids whose
    ``combine`` has no single-field ufunc (the AdjacentSum/TopK discipline):
    ceil(log2 n) shifted whole-array combines, identity-filled vacated
    slots, (older, newer) combine order preserved for non-commutativity."""

    def _scan(self, p, axis, suffix: bool):
        out = {k: np.array(v, copy=True) for k, v in p.items()}
        n = p_len(out) if axis == 0 else next(iter(out.values())).shape[axis]
        d = 1
        ident = self.identity(1)
        while d < n:
            shifted = {
                k: _shift_prev_by(v, axis, -d if suffix else d, ident[k][0])
                for k, v in out.items()
            }
            out = self.combine(out, shifted) if suffix else self.combine(shifted, out)
            d <<= 1
        return out

    def accumulate(self, p, axis=0):
        return self._scan(p, axis, suffix=False)

    def raccumulate(self, p, axis=0):
        return self._scan(p, axis, suffix=True)


class MaxRun(_DoublingScanMixin, Monoid):
    """Longest CONSECUTIVE run of predicate hits in the window — streak
    detection (``≥k``-long retry storms, uninterrupted tool-call chains,
    error bursts) as an associative aggregate. The classic
    prefix/suffix/best segment monoid (the textbook "maximum consecutive
    ones" divide-and-conquer, e.g. Blelloch's prefix-sums formulation):
    partial = ``(p, s, b, n)`` = (hit-run touching the segment's LEFT
    edge, hit-run touching its RIGHT edge, best run anywhere inside,
    segment length); ``combine`` bridges the seam:

        p' = a.p == a.n ? a.n + b.p : a.p        (a all-hits ⇒ prefix
                                                  extends into b)
        s' = b.s == b.n ? b.n + a.s : b.s
        b' = max(a.b, b.b, a.s + b.p)            (the seam run)
        n' = a.n + b.n

    Associative but NOT commutative (concatenation order) and NOT
    invertible — Two-Stacks/DABA territory. Unlike DfaTransform's
    ``dfa_run`` (which answers "does a run ≥ k exist" for a FIXED k
    compiled into the automaton), MaxRun returns the exact LENGTH of the
    longest run, for free, for every threshold at once. ``lift``
    totalizes arbitrary integer input as parity (``v mod 2`` — the
    DfaTransform mod-alphabet discipline, so the generic lockstep/kernel
    grids exercise it unmodified); semantic callers lift the predicate
    to a 0/1 column, a fixed point of the parity map. Exact int64; the
    SQL oracle reconstructs each frame (band self-join), string_aggs the
    bits in window order and takes the longest '1'-split segment —
    hash-exact. ``lower`` = b."""

    name = "maxrun"
    commutative = False
    invertible = False

    def lift(self, values):
        bit = (np.asarray(values).astype(np.int64)) % 2
        return {"p": bit.copy(), "s": bit.copy(), "b": bit.copy(),
                "n": np.ones_like(bit)}

    def identity(self, n=1):
        z = np.zeros(n, dtype=np.int64)
        return {"p": z, "s": z.copy(), "b": z.copy(), "n": z.copy()}

    def combine(self, a, b):
        ap, bp = np.broadcast_arrays(a["p"], b["p"])
        as_, bs = np.broadcast_arrays(a["s"], b["s"])
        ab, bb = np.broadcast_arrays(a["b"], b["b"])
        an, bn = np.broadcast_arrays(a["n"], b["n"])
        return {
            "p": np.where(ap == an, an + bp, ap),
            "s": np.where(bs == bn, bn + as_, bs),
            "b": np.maximum(np.maximum(ab, bb), as_ + bp),
            "n": an + bn,
        }

    def lower(self, p):
        return p["b"]

    # --- closed-form scans over ELEMENT partials (the hot path: the
    # block kernels scan freshly-lifted rows) ------------------------
    # prefix: first-zero-so-far gives the left-edge run, last-zero-so-far
    # gives the run ending at i, cummax of that gives the best — three
    # ufunc accumulates instead of ceil(log2 n) 4-field combine passes.
    def accumulate(self, p, axis=0):
        if not bool((p["n"] == 1).all()):
            return super().accumulate(p, axis)
        bit = np.moveaxis(p["b"], axis, 0)
        N = bit.shape[0]
        idx = np.arange(N, dtype=np.int64).reshape((N,) + (1,) * (bit.ndim - 1))
        lz = np.maximum.accumulate(np.where(bit == 0, idx, -1), axis=0)
        s = idx - lz
        b = np.maximum.accumulate(s, axis=0)
        fz = np.minimum.accumulate(np.where(bit == 0, idx, N), axis=0)
        pfx = np.minimum(idx + 1, fz)
        n = np.broadcast_to(idx + 1, bit.shape)
        mv = lambda a: np.ascontiguousarray(np.moveaxis(a, 0, axis))
        return {"p": mv(pfx), "s": mv(s), "b": mv(b), "n": mv(np.array(n))}

    def raccumulate(self, p, axis=0):
        if not bool((p["n"] == 1).all()):
            return super().raccumulate(p, axis)
        # suffix of [i..N-1] = prefix of the reversed bits with the
        # edge runs swapped (best and length are reversal-invariant);
        # re-contiguify the flip views — downstream combines run ufuncs
        # over these on the hot block path
        rev = p_reverse(p, axis=axis)
        acc = self.accumulate(rev, axis=axis)
        out = {k: np.ascontiguousarray(np.flip(v, axis=axis))
               for k, v in acc.items()}
        return {"p": out["s"], "s": out["p"], "b": out["b"], "n": out["n"]}


# empty-segment sentinel: −∞ for the max over adjacent gaps (the MinCount
# n=−1 identity-sentinel discipline, AggregationFunctions.hpp:503)
_GAP_NONE = np.int64(np.iinfo(np.int64).min)


class MaxGap(_DoublingScanMixin, Monoid):
    """Maximum ADJACENT event-time gap inside the window — stall/silence
    detection over transcripts ("longest pause between consecutive turns
    in the last w turns", the input_hint ``ts`` column). Segment
    concatenation like AdjacentSum, but the seam reduces under max
    instead of sum: partial = ``(f, l, g, n)`` = (first value, last
    value, max adjacent gap, length);

        g' = max(a.g, b.g, b.f − a.l)        (the seam gap)

    with ``g = −∞`` (int64 min sentinel) for segments holding < 2
    elements. Associative for ARBITRARY integer inputs (the pair set of
    a concatenation is split-invariant), so the generic grids feed it
    random ints unmodified; on event-time-ordered input every gap is
    ≥ 0. NOT commutative, NOT invertible. ``lower`` = g where n ≥ 2
    else 0 (the SQL oracle's ``coalesce(max(ts − lag(ts)), 0)`` —
    hash-exact in integer time units). Scans are Hillis–Steele doubling
    via the shared mixin."""

    name = "maxgap"
    commutative = False
    invertible = False

    def lift(self, values):
        v = np.asarray(values).astype(np.int64)
        return {
            "f": v.copy(),
            "l": v.copy(),
            "g": np.full_like(v, _GAP_NONE),
            "n": np.ones_like(v),
        }

    def identity(self, n=1):
        z = np.zeros(n, dtype=np.int64)
        return {"f": z, "l": z.copy(),
                "g": np.full(n, _GAP_NONE, dtype=np.int64), "n": z.copy()}

    def combine(self, a, b):
        af, bf = np.broadcast_arrays(a["f"], b["f"])
        al, bl = np.broadcast_arrays(a["l"], b["l"])
        ag, bg = np.broadcast_arrays(a["g"], b["g"])
        an, bn = np.broadcast_arrays(a["n"], b["n"])
        both = (an > 0) & (bn > 0)
        seam = np.where(both, bf - al, _GAP_NONE)
        return {
            "f": np.where(an > 0, af, bf),
            "l": np.where(bn > 0, bl, al),
            "g": np.maximum(np.maximum(ag, bg), seam),
            "n": an + bn,
        }

    def lower(self, p):
        return np.where(p["n"] >= 2, p["g"], 0).astype(np.int64)

    # --- closed-form scans over ELEMENT partials: the running max-gap is
    # one diff + one ufunc cummax (vs log2 n 4-field combine passes) ---
    def accumulate(self, p, axis=0):
        if not bool((p["n"] == 1).all()):
            return super().accumulate(p, axis)
        v = np.moveaxis(p["f"], axis, 0)
        N = v.shape[0]
        d = np.full_like(v, _GAP_NONE)
        if N > 1:
            d[1:] = v[1:] - v[:-1]
        g = np.maximum.accumulate(d, axis=0)
        n = np.broadcast_to(
            np.arange(1, N + 1, dtype=np.int64).reshape(
                (N,) + (1,) * (v.ndim - 1)
            ),
            v.shape,
        )
        f = np.broadcast_to(v[:1], v.shape)
        mv = lambda a: np.ascontiguousarray(np.moveaxis(a, 0, axis))
        return {"f": mv(np.array(f)), "l": mv(v.copy()),
                "g": mv(g), "n": mv(np.array(n))}

    def raccumulate(self, p, axis=0):
        if not bool((p["n"] == 1).all()):
            return super().raccumulate(p, axis)
        v = np.moveaxis(p["f"], axis, 0)
        N = v.shape[0]
        d = np.full_like(v, _GAP_NONE)
        if N > 1:
            d[:-1] = v[1:] - v[:-1]
        g = np.flip(np.maximum.accumulate(np.flip(d, 0), axis=0), 0)
        n = np.broadcast_to(
            np.arange(N, 0, -1, dtype=np.int64).reshape(
                (N,) + (1,) * (v.ndim - 1)
            ),
            v.shape,
        )
        l = np.broadcast_to(v[-1:], v.shape)
        mv = lambda a: np.ascontiguousarray(np.moveaxis(a, 0, axis))
        return {"f": mv(v.copy()), "l": mv(np.array(l)),
                "g": mv(g), "n": mv(np.array(n))}


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def registry(dtype=np.float64) -> dict[str, Monoid]:
    """All §2.A monoids keyed by name (SURVEY.md §2.A table)."""
    return {
        "sum": Sum(dtype),
        "count": Count(),
        "max": Max(dtype),
        "min": Min(dtype),
        "mean": Mean(),
        "geomean": GeometricMean(),
        "stddev": SampleStdDev(dtype),
        "argmax": ArgMax(key_dtype=dtype),
        "mincount": MinCount(dtype),
        "relvar": RelativeVariation(dtype),
        "bloom": BloomFilter(),
        "hll": HyperLogLog(),
        "histq": HistogramQuantile(),
        "cms": CountMinSketch(),
        "collect": Collect(),
        "busyloop": BusyLoop(),
        # CEP family: pattern matching as transition-composition monoids.
        # "dfa" = the retry-storm detector (≥3 consecutive symbol-2 events
        # over the 5-symbol event alphabet); "dfa_funnel" = the contiguous
        # signup(4)→click(0)→purchase(3) episode detector (KMP automaton).
        "dfa": DfaTransform(),
        "dfa_funnel": DfaTransform(dfa_contains([4, 0, 3], 5)),
        # timestamped family: half-life-decayed sum over packed (t, v)
        "decayed": DecayedSum(),
        # order-statistic family: 3rd-largest value in the window
        "top3": TopK(3),
        # set-similarity family: 8-lane rolling MinHash signature
        "minhash": MinHashSig(),
        # sequence family: lag-1 adjacent-product sum (autocovariance
        # numerator) — non-commutative on a numeric domain
        "adjsum": AdjacentSum(),
        # regression family: OLS slope numerator — the first invertible
        # NON-commutative monoid (SubtractOnEvict on a positional partial)
        "trend": Trend(),
        # exact small-domain distinct (bitset-OR): distinct tools/window
        "toolset": ToolSet(),
        # segment family: longest consecutive predicate streak
        # (prefix/suffix/best) — exact run LENGTH, every threshold at once
        "maxrun": MaxRun(),
        # segment family: max adjacent event-time gap — stall detection
        "maxgap": MaxGap(),
    }


_MONOID_CACHE: dict = {}


def get_monoid(name: str, dtype=np.float64) -> Monoid:
    """Monoids are stateless — cache instances (kernel hot paths create
    thousands per batch for short keys)."""
    key = (name, np.dtype(dtype).str)
    cached = _MONOID_CACHE.get(key)
    if cached is None:
        cached = _MONOID_CACHE[key] = registry(dtype)[name]
    return cached
