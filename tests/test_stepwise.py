"""Per-op algorithm lockstep vs the ReCalc oracle — the pytest port of
cpp/src/test.cc:45-440 (steady-state, sawtooth, thirds scenarios) for
the invertible ops of test.cc:718-721 and non-invertible of 729-732."""

import numpy as np
import pytest

from sliding_window_aggregators_spark.functions import get_monoid
from sliding_window_aggregators_spark.operators.stepwise import ALGORITHMS, make
from conftest import approx_eq

INVERTIBLE = ["sum", "mean", "stddev", "collect", "trend"]
NON_INVERTIBLE = ["mincount", "argmax", "max", "geomean", "dfa", "top3", "minhash", "adjsum", "toolset", "maxrun", "maxgap"]
ALGS = [
    "two_stacks",
    "two_stacks_lite",
    "implicit_two_stacks_lite",
    "aba",
    "daba",
    "daba_lite",
    "flatfit",
    "dynamic_flatfit",
    "reactive",
    "okasaki",
    "amta",
]


def lockstep(alg_name, mname, ticks, w):
    alg = make(alg_name, get_monoid(mname))
    oracle = make("recalc", get_monoid(mname))
    for i in range(ticks):
        v = 1 + (i % 101)
        if mname == "argmax":
            v = (i, 1 + (i % 101))
        if alg.size() == w:
            alg.evict()
            oracle.evict()
        alg.insert(v)
        oracle.insert(v)
        assert alg.size() == oracle.size()
        assert approx_eq(alg.query(), oracle.query()), (alg_name, mname, w, i)


@pytest.mark.parametrize("alg", ALGS)
@pytest.mark.parametrize("mname", INVERTIBLE + NON_INVERTIBLE)
def test_steady_state_w100(alg, mname):
    """Steady-state loop, window 100 (test.cc:83-101 scaled down)."""
    lockstep(alg, mname, 700, 100)


@pytest.mark.parametrize("mname", INVERTIBLE)
def test_soe_steady_state(mname):
    lockstep("soe", mname, 2000, 100)


def test_soe_rejects_non_invertible():
    """Mirrors the compile-fail rust/tests/trybuild_soe_max.fail."""
    with pytest.raises(TypeError):
        make("soe", get_monoid("max"))


@pytest.mark.parametrize("alg", ALGS)
@pytest.mark.parametrize("w", [519])
@pytest.mark.parametrize("mname", ["mincount", "collect"])
def test_sawtooth(alg, w, mname):
    """Fill to w, drain to empty, ×2 (test.cc:240-336 scaled; the 1921
    variant runs for two algorithms below)."""
    m_alg = make(alg, get_monoid(mname))
    oracle = make("recalc", get_monoid(mname))
    i = 0
    for _rep in range(2):
        for _ in range(w):
            v = 1 + (i % 101)
            i += 1
            m_alg.insert(v)
            oracle.insert(v)
            assert approx_eq(m_alg.query(), oracle.query())
        while oracle.size():
            m_alg.evict()
            oracle.evict()
            assert approx_eq(m_alg.query(), oracle.query())


@pytest.mark.parametrize("alg", ["two_stacks_lite", "daba_lite"])
@pytest.mark.parametrize("w", [1921])
@pytest.mark.parametrize("mname", ["mincount"])
def test_sawtooth_w1921(alg, w, mname):
    """The reference's larger sawtooth width for two representatives."""
    m_alg = make(alg, get_monoid(mname))
    oracle = make("recalc", get_monoid(mname))
    i = 0
    for _ in range(w):
        v = 1 + (i % 101)
        i += 1
        m_alg.insert(v)
        oracle.insert(v)
        assert approx_eq(m_alg.query(), oracle.query())
    while oracle.size():
        m_alg.evict()
        oracle.evict()
        assert approx_eq(m_alg.query(), oracle.query())


@pytest.mark.parametrize("alg", ALGS)
@pytest.mark.parametrize("w", [519])
def test_thirds_seesaw(alg, w):
    """Oscillate window between w and w/3, ×5 (test.cc:339-440)."""
    mname = "mincount"
    m_alg = make(alg, get_monoid(mname))
    oracle = make("recalc", get_monoid(mname))
    i = 0
    for _rep in range(5):
        while oracle.size() < w:
            v = 1 + (i % 101)
            i += 1
            m_alg.insert(v)
            oracle.insert(v)
            assert approx_eq(m_alg.query(), oracle.query())
        while oracle.size() > w // 3:
            m_alg.evict()
            oracle.evict()
            assert approx_eq(m_alg.query(), oracle.query())


def test_all_algorithms_registered():
    assert set(ALGORITHMS) == {"recalc", "soe"} | set(ALGS)


def test_amta_bulk_evict_vs_brute():
    """AMTA bulkEvict leaves exactly (t, youngest] and stays consistent for
    follow-up inserts (cpp/src/AMTA.hpp:244-290; Collect order witness)."""
    rng = np.random.default_rng(7)
    for rep in range(15):
        alg = make("amta", get_monoid("collect"))
        n = int(rng.integers(3, 200))
        ts = np.cumsum(rng.integers(1, 4, n))
        for t, v in zip(ts, range(n)):
            alg.insert(float(v), t=int(t))
        cut = int(rng.integers(0, ts[-1] + 2))
        alg.bulk_evict(cut)
        expected = [float(v) for t, v in zip(ts, range(n)) if t > cut]
        assert alg.query() == expected, (rep, cut)
        alg.insert(-1.0, t=int(ts[-1]) + 10)
        assert alg.query() == expected + [-1.0]


def test_amta_size_sentinel_stable_after_bulk_evict():
    """After bulk_evict the reference stops size tracking (sentinel −1);
    the sentinel must STAY −1 — an unguarded increment would drift it to
    plausible-looking wrong counts that a size-driven evict loop trusts."""
    m = get_monoid("sum")
    alg = make("amta", m)
    for i in range(10):
        alg.insert(float(i), t=i)
    alg.bulk_evict(4)
    assert alg.size() == -1
    alg.insert(99.0, t=100)
    alg.evict()
    assert alg.size() == -1  # still the sentinel, not 0/1 drift
