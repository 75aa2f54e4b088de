"""Property tests: the portable-HLL register construction and the PSI
term algebra each replicated in pure Python (the DuckDB-replication
test pattern from test_property_backtest_te) — pins the md5 bit
slicing and the quantized-ln accumulation bit-for-bit."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _py_hll_register(key: str, p: int):
    """Pure-python twin of sketch.hll_registers' (j, rho) for one key."""
    hx = hashlib.md5(key.encode("utf-8")).hexdigest()
    j = (int(hx[:8], 16) & 0x7FFFFFFF) % (1 << p)
    word = hx[8:21]  # 13 hex chars = 52 bits
    stripped = word.lstrip("0")
    z = 13 - len(stripped)
    lz = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}.get(
        stripped[:1], 0
    )
    return j, 4 * z + lz + 1


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([4, 6, 10]),
)
def test_hll_registers_match_python_reference(spark, keys, p):
    from pangool_spark.operators.sketch import hll_registers

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = sorted(map(tuple, hll_registers(df, "k", p=p).collect()))
    regs = {}
    for k in keys:
        j, rho = _py_hll_register(k, p)
        regs[j] = max(regs.get(j, 0), rho)
    assert got == sorted(regs.items())


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
)
def test_psi_matches_python_reference(spark, xs, ys):
    from pangool_spark.operators.profile import psi_drift

    w = 10
    a = spark.createDataFrame([(v,) for v in xs], "v bigint")
    b = spark.createDataFrame([(v,) for v in ys], "v bigint")
    rows = psi_drift(a, b, "v", bin_width=w).collect()

    ca, cb = {}, {}
    for v in xs:
        ca[v // w] = ca.get(v // w, 0) + 1
    for v in ys:
        cb[v // w] = cb.get(v // w, 0) + 1
    joint = sorted(set(ca) | set(cb))
    nb, ta, tb = len(joint), len(xs), len(ys)
    total_q = 0
    expect = {}
    for bin_ in joint:
        na_, nb_ = ca.get(bin_, 0), cb.get(bin_, 0)
        p_a = (na_ + 1) / (ta + nb)
        p_b = (nb_ + 1) / (tb + nb)
        term = round(
            (p_b - p_a) * math.log(((nb_ + 1) * (ta + nb)) / ((na_ + 1) * (tb + nb))),
            9,
        )
        expect[bin_] = (na_, nb_, term)
        total_q += int(round(term * 1e9))
    total = total_q / 1e9
    assert len(rows) == nb
    for r in rows:
        na_, nb_, term = expect[r["bin"]]
        assert (r["n_a"], r["n_b"]) == (na_, nb_)
        assert r["psi_term"] == term
        assert r["psi_total"] == total
