"""Fourth batch of independent pure-Python cross-checks: the deterministic
sampling family (hash / stratified / fixed-size / per-group / domain-quota
/ temperature mixture) and deterministic Lloyd k-means. Every sampler keys
on md5 of a stable id, so hashlib recomputes the exact selected sets —
including the nesting guarantees the docstrings promise."""

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


def _hex8(key) -> str:
    return hashlib.md5(str(key).encode()).hexdigest()[:8]


def _md5(key) -> str:
    return hashlib.md5(str(key).encode()).hexdigest()


def _th(rate: float) -> str:
    return format(min(int(rate * 16 ** 8), 16 ** 8 - 1), "08x")


def _round_half_up(x: float, nd: int) -> float:
    """Spark's ROUND(double, nd): BigDecimal.valueOf (shortest repr) then
    HALF_UP — NOT Python's banker's round()."""
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"),
                                           rounding=ROUND_HALF_UP))


_ids = st.lists(st.integers(0, 500), min_size=1, max_size=60, unique=True)


# ---------------------------------------------------------------------------
# hash_sample — exact selected set + monotone nesting
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(_ids, st.floats(0.0, 1.0, allow_nan=False))
def test_hash_sample_matches_python_and_nests(spark, ids, rate):
    from ecokg_spark.operators.sample import hash_sample

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"] for r in hash_sample(df, rate, "doc_id").collect()}
    exp = set(ids) if rate >= 1.0 else {
        i for i in ids if _hex8(i) < _th(rate)}
    assert got == exp

    # nesting: the rate/2 sample is a subset of the rate sample
    smaller = {r["doc_id"]
               for r in hash_sample(df, rate / 2, "doc_id").collect()}
    assert smaller <= got


# ---------------------------------------------------------------------------
# stratified_sample — per-stratum thresholds, default_rate, nesting
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(_ids,
       st.dictionaries(st.sampled_from(["s0", "s1", "s2"]),
                       st.floats(0.0, 1.2, allow_nan=False), max_size=3),
       st.floats(0.0, 1.0, allow_nan=False))
def test_stratified_sample_matches_python(spark, ids, rates, default_rate):
    from ecokg_spark.operators.sample import stratified_sample

    rows = [(i, f"s{i % 4}") for i in ids]  # s3 never in rates -> default
    df = spark.createDataFrame(rows, "doc_id long, src string")
    got = {r["doc_id"]
           for r in stratified_sample(df, "src", rates, key_col="doc_id",
                                      default_rate=default_rate).collect()}
    exp = set()
    for i, s in rows:
        if s in rates:
            r = rates[s]
            if r >= 1.0 or _hex8(i) < _th(min(r, 1.0)):
                exp.add(i)
        elif default_rate > 0.0 and (
                default_rate >= 1.0 or _hex8(i) < _th(default_rate)):
            exp.add(i)
    assert got == exp


# ---------------------------------------------------------------------------
# fixed_size_sample / group_fixed_sample — exact-n md5-ordered prefixes
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(_ids, st.integers(0, 20))
def test_fixed_size_sample_matches_python(spark, ids, n):
    from ecokg_spark.operators.sample import fixed_size_sample

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"] for r in fixed_size_sample(df, n, "doc_id").collect()}
    exp = set(sorted(ids, key=lambda i: (_md5(i), i))[:n])
    assert got == exp


@settings(max_examples=10, **_S)
@given(_ids, st.integers(1, 8))
def test_group_fixed_sample_matches_python(spark, ids, n):
    from ecokg_spark.operators.sample import group_fixed_sample

    rows = [(i, f"g{i % 3}") for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = {(r["doc_id"], r["grp"])
           for r in group_fixed_sample(df, "grp", n, "doc_id").collect()}
    exp = set()
    for g in {r[1] for r in rows}:
        members = sorted((i for i, gg in rows if gg == g),
                         key=lambda i: (_md5(i), i))
        exp |= {(i, g) for i in members[:n]}
    assert got == exp


# ---------------------------------------------------------------------------
# domain_quota_sample — salted two-phase == plain per-domain top-quota
# ---------------------------------------------------------------------------

def _regdom(host: str) -> str:
    from ecokg_spark.functions.url import SECOND_LEVEL_SUFFIXES

    labels = host.split(".")
    if len(labels) < 2:
        return host
    if ".".join(labels[-2:]) in SECOND_LEVEL_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


_host = st.sampled_from([
    "www.big.example.com", "big.example.com", "other.example.com",
    "a.co.uk", "b.news.co.uk", "solo",
])


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 400), _host),
                min_size=1, max_size=50, unique_by=lambda r: r[0]),
       st.integers(1, 6))
def test_domain_quota_sample_matches_python(spark, rows, quota):
    from ecokg_spark.operators.sample import domain_quota_sample

    data = [(i, f"http://{h}/p/{i}") for i, h in rows]
    df = spark.createDataFrame(data, "doc_id long, url string")
    got = {(r["doc_id"], r["domain"], r["rank"])
           for r in domain_quota_sample(df, quota=quota).collect()}
    by_dom: dict[str, list] = {}
    for i, h in rows:
        by_dom.setdefault(_regdom(h), []).append(i)
    exp = set()
    for dom, members in by_dom.items():
        members.sort(key=lambda i: (_md5(i), i))
        exp |= {(i, dom, rk + 1) for rk, i in enumerate(members[:quota])}
    assert got == exp


# ---------------------------------------------------------------------------
# temperature_mixture — sqrt weights, decimal-staged normalization
# ---------------------------------------------------------------------------

@settings(max_examples=10, **_S)
@given(st.lists(st.integers(1, 5000), min_size=1, max_size=6),
       st.integers(1, 10 ** 6))
def test_temperature_mixture_matches_python(spark, counts, budget):
    from ecokg_spark.operators.sample import temperature_mixture

    # build each source's n rows engine-side via a sequence explode
    import pyspark.sql.functions as F
    srcs = spark.createDataFrame(
        [(f"src{s}", n) for s, n in enumerate(counts)], "src string, n int")
    df = srcs.select("src", F.explode(F.sequence(F.lit(1), F.col("n"))))
    got = {r["src"]: (r["n_docs"], r["share"], r["expected_docs"])
           for r in temperature_mixture(df, "src", temperature=2.0,
                                        budget=budget).collect()}
    ws = {f"src{s}": Decimal(repr(math.sqrt(n)))
          for s, n in enumerate(counts)}
    total = sum(ws.values())
    for s, n in enumerate(counts):
        key = f"src{s}"
        share = _round_half_up(float(str(ws[key])) / float(str(total)), 6)
        assert got[key][0] == n
        assert got[key][1] == share
        assert got[key][2] == math.floor(share * budget)


# ---------------------------------------------------------------------------
# kmeans_lloyd — deterministic seeds/assign/update vs a Python replay
# ---------------------------------------------------------------------------

def test_kmeans_lloyd_matches_python_reference(spark):
    from ecokg_spark.operators.embed import kmeans_lloyd

    # integer components: sums and means stay exactly representable, so
    # the decimal-staged Spark mean == Python's float division exactly
    vecs = [(f"v{i:02d}", [float((i * 7) % 11), float((i * 3) % 5),
                           float(i % 4)]) for i in range(24)]
    df = spark.createDataFrame(vecs, "vec_id string, embedding array<double>")
    k, iters = 3, 2
    got = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_lloyd(df, k=k, iterations=iters).collect()}

    def assign(cents):
        out = {}
        for vid, v in vecs:
            best = min(
                ((_round_half_up(sum((a - b) * (a - b)
                                     for a, b in zip(v, c)), 9), ci)
                 for ci, c in enumerate(cents)))
            out[vid] = (best[1], best[0])
        return out

    seeds = sorted(vecs, key=lambda r: (_md5(r[0]), r[0]))[:k]
    cents = [list(v) for _, v in seeds]
    for _ in range(iters):
        a = assign(cents)
        groups: dict[int, list] = {}
        for vid, v in vecs:
            groups.setdefault(a[vid][0], []).append(v)
        for ci in range(k):
            if ci in groups:
                m = groups[ci]
                cents[ci] = [sum(col) / len(m) for col in zip(*m)]
    exp = assign(cents)
    assert {v: c for v, (c, _) in got.items()} == \
           {v: c for v, (c, _) in exp.items()}
    for vid, (_, d) in exp.items():
        assert math.isclose(got[vid][1], d, rel_tol=1e-12, abs_tol=1e-12)
