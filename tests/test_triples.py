"""ReVerb-lite triple extraction: pattern behavior on crafted sentences."""

from pyspark.sql import functions as F

from ecokg_spark.operators.triples import extract_triple_udf, extract_triples


def _extract(spark, sents):
    df = spark.createDataFrame([(s,) for s in sents], "sentence string")
    return [
        (r["t"]["subj_mention"], r["t"]["verb"], r["t"]["obj_mention"])
        for r in df.select(extract_triple_udf("sentence").alias("t")).collect()
    ]


def test_basic_svo(spark):
    out = _extract(spark, ["tomato has phenotype drought tolerance."])
    assert out == [("tomato", "has phenotype", "drought tolerance")]


def test_longest_verb_wins(spark):
    # "has phenotype" must not be split as "has" + "phenotype ..."
    out = _extract(spark, ["maize has part seed coat."])
    assert out == [("maize", "has part", "seed coat")]


def test_no_match_yields_null(spark):
    out = _extract(spark, ["no relation phrase here.", "Terms & conditions apply."])
    assert out == [(None, None, None), (None, None, None)]


def test_multiword_args_and_punct(spark):
    out = _extract(spark, ["Solanum lycopersicum grows in alkaline soil"])
    assert out == [("Solanum lycopersicum", "grows in", "alkaline soil")]


def test_lang_gate(spark):
    df = spark.createDataFrame(
        [("u1", ["tomato is a plant."], "en"), ("u2", ["tomato is a plant."], "de")],
        "url string, sentences array<string>, lang string",
    )
    got = extract_triples(df)
    assert got.count() == 1
    assert got.first()["url"] == "u1"
