"""PII redaction (functions/pii.py) and deterministic sampling
(operators/sample.py)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from ecokg_spark.functions.pii import pii_counts, redact_pii
from ecokg_spark.operators.sample import (
    domain_quota_sample,
    hash_sample,
    sample_threshold_hex,
)


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(redact_pii("text").alias("t"), *pii_counts("text")).first()
    return row


def test_redact_email_ip_phone(spark):
    r = _one(spark, "mail a.b+c@sub.example.org, host 192.168.0.1, "
                    "call +1 (415) 555-0100 ok")
    assert r["t"] == "mail [EMAIL], host [IP], call [PHONE] ok"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)


def test_redact_order_no_cross_matching(spark):
    # digits in an email local part must not leak a phone match; a bare
    # IP must not half-match the phone pattern
    r = _one(spark, "user4155550100@example.com and 10.0.200.7 only")
    assert r["t"] == "[EMAIL] and [IP] only"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 0)


def test_redact_clean_text_untouched(spark):
    r = _one(spark, "no private data here, just words and the number 42")
    assert r["t"] == "no private data here, just words and the number 42"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


def test_hash_sample_deterministic_and_nested(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    s25 = {r["id"] for r in hash_sample(df, 0.25, "id").collect()}
    s25b = {r["id"] for r in
            hash_sample(df.repartition(7), 0.25, "id").collect()}
    assert s25 == s25b                      # layout-independent
    assert 0.18 < len(s25) / 2000 < 0.32    # ~rate
    s10 = {r["id"] for r in hash_sample(df, 0.10, "id").collect()}
    assert s10 <= s25                       # nested samples (same hash axis)
    assert hash_sample(df, 1.0, "id").count() == 2000


def test_sample_threshold_hex_bounds():
    assert sample_threshold_hex(0.0) == "00000000"
    assert sample_threshold_hex(0.25) == "40000000"
    assert sample_threshold_hex(1.0) == "ffffffff"


def _skewed_docs(spark):
    rows = [(i, "https://big.example.com/p%d" % i) for i in range(200)]
    rows += [(1000 + i, "https://tiny.example.org/p%d" % i) for i in range(2)]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_domain_quota_caps_and_matches_naive_window(spark):
    df = _skewed_docs(spark)
    out = domain_quota_sample(df, "url", "doc_id", quota=5)
    got = out.groupBy("domain").count().collect()
    counts = {r["domain"]: r["count"] for r in got}
    assert counts == {"example.com": 5, "example.org": 2}
    # salted two-phase == naive single-window top-k
    exp = (
        df.withColumn("_h", F.md5(F.col("doc_id").cast("string")))
        .withColumn("_dom", F.regexp_extract("url", "https://(?:big\\.|tiny\\.)?([a-z.]+)/", 1))
        .withColumn("rank", F.row_number().over(
            Window.partitionBy("_dom").orderBy("_h", "doc_id")))
        .where(F.col("rank") <= 5)
    )
    assert ({(r["doc_id"], r["rank"]) for r in out.collect()}
            == {(r["doc_id"], r["rank"]) for r in exp.collect()})


def test_stratified_sample_rates_and_monotonicity(spark):
    from ecokg_spark.operators.sample import stratified_sample

    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "xx"))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", {"en": 1.0, "de": 0.5})
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert by.get("en") == 100          # rate 1.0 keeps everything
    assert 25 <= by.get("de", 0) <= 75  # ~50 of 100
    assert "xx" not in by               # unknown stratum dropped

    # monotone subsampling: the 0.25 cut is a subset of the 0.5 cut
    small = {r["doc_id"] for r in stratified_sample(
        df, "lang", {"de": 0.25}).select("doc_id").collect()}
    big = {r["doc_id"] for r in stratified_sample(
        df, "lang", {"de": 0.5}).select("doc_id").collect()}
    assert small <= big


def test_stratified_sample_default_rate(spark):
    from ecokg_spark.operators.sample import stratified_sample

    df = spark.createDataFrame(
        [(i, "zz") for i in range(200)], "doc_id long, lang string")
    out = stratified_sample(df, "lang", {"en": 1.0}, default_rate=1.0)
    assert out.count() == 200


def test_classifier_score_orders_quality(spark):
    """Running prose with stopwords scores above punctuation soup; score
    stays within (0, 1)."""
    from ecokg_spark.functions.text import classifier_score

    df = spark.createDataFrame(
        [(1, "the cat and the dog ran to the park and it is sunny today"),
         (2, "@@@ ??? !!! ,,, ;;; ::: ((( ))) [[[ ]]] --- ...")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", classifier_score("text").alias("s")).collect()}
    assert 0.0 < got[2] < got[1] < 1.0


def test_classifier_score_rejects_unknown_weight(spark):
    import pytest as _pytest

    from ecokg_spark.functions.text import classifier_score

    with _pytest.raises(ValueError, match="unknown classifier"):
        classifier_score("text", weights={"nope": 1.0})


def test_fixed_size_sample_exact_and_stable(spark):
    from ecokg_spark.operators.sample import fixed_size_sample

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = sorted(r["doc_id"] for r in fixed_size_sample(df, 50, "doc_id").collect())
    b = sorted(r["doc_id"] for r in
               fixed_size_sample(df.repartition(13), 50, "doc_id").collect())
    assert len(a) == 50 and a == b  # exact size, layout-invariant
    # nested property: the 20-sample is a prefix of the 50-sample
    c = set(r["doc_id"] for r in fixed_size_sample(df, 20, "doc_id").collect())
    assert c <= set(a)


def test_temperature_mixture_t2_shares_and_budget(spark):
    import math

    import pytest

    from ecokg_spark.operators.sample import temperature_mixture

    rows = [("big",)] * 900 + [("mid",)] * 90 + [("small",)] * 10
    df = spark.createDataFrame(rows, "source string")
    got = {r["source"]: r for r in
           temperature_mixture(df, "source", temperature=2.0,
                               budget=1000).collect()}
    tot = math.sqrt(900) + math.sqrt(90) + math.sqrt(10)
    for name, n in [("big", 900), ("mid", 90), ("small", 10)]:
        assert got[name]["n_docs"] == n
        assert got[name]["share"] == pytest.approx(
            round(math.sqrt(n) / tot, 6), abs=2e-6)
        assert got[name]["expected_docs"] == math.floor(
            got[name]["share"] * 1000)
    # T=2 up-weights the small source vs proportional sampling
    assert got["small"]["share"] > 10 / 1000
    # and the big source loses mass
    assert got["big"]["share"] < 900 / 1000


def test_temperature_mixture_t1_is_proportional(spark):
    import pytest

    from ecokg_spark.operators.sample import temperature_mixture

    rows = [("a",)] * 75 + [("b",)] * 25
    df = spark.createDataFrame(rows, "source string")
    got = {r["source"]: r["share"] for r in
           temperature_mixture(df, "source", temperature=1.0).collect()}
    assert got["a"] == pytest.approx(0.75, abs=1e-6)
    assert got["b"] == pytest.approx(0.25, abs=1e-6)
