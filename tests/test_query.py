"""SPARQL BGP -> DataFrame compiler (EP3): the reference's published query
shape (tests/test_query.py:29-40 — count nodes by category) plus
conjunctive patterns, against in-engine KG tables instead of an endpoint."""

import pytest

from ecokg_spark.query import SparqlError, sparql_select


@pytest.fixture()
def kg(spark):
    nodes = spark.createDataFrame(
        [("G:1", "biolink:GenomicEntity"), ("G:2", "biolink:GenomicEntity"),
         ("T:1", "biolink:OrganismTaxon"), ("P:1", "biolink:PhenotypicFeature")],
        "id string, category string")
    edges = spark.createDataFrame(
        [("G:1", "biolink:in_taxon", "T:1"),
         ("G:2", "biolink:in_taxon", "T:1"),
         ("G:1", "biolink:has_phenotype", "P:1")],
        "subject string, predicate string, object string")
    return nodes, edges


def test_reference_golden_query_shape(spark, kg):
    """The reference's canonical query (query template test_template.yaml /
    tests/test_query.py:33-36): SELECT (COUNT(?v2) AS ?v1) ?v0
    WHERE { ?v2 biolink:category ?v0 } GROUP BY ?v0."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT (COUNT(?v2) AS ?v1) ?v0 WHERE { ?v2 biolink:category ?v0 } GROUP BY ?v0",
        nodes, edges)
    assert out.columns == ["v1", "v0"]  # header shape parity (vars, no '?')
    got = {r["v0"]: r["v1"] for r in out.collect()}
    assert got == {"biolink:GenomicEntity": 2, "biolink:OrganismTaxon": 1,
                   "biolink:PhenotypicFeature": 1}


def test_conjunctive_pattern_join(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?g ?p WHERE { ?g biolink:in_taxon T:1 . "
        "?g biolink:has_phenotype ?p }",
        nodes, edges)
    assert [tuple(r) for r in out.collect()] == [("G:1", "P:1")]


def test_variable_predicate(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark, "SELECT ?pred WHERE { G:1 ?pred ?o }", nodes, edges)
    assert {r["pred"] for r in out.collect()} == {
        "biolink:in_taxon", "biolink:has_phenotype"}


def test_category_join_edges(spark, kg):
    """Mix node-property and edge patterns through a shared variable."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT (COUNT(?g) AS ?n) ?c WHERE { ?g biolink:in_taxon T:1 . "
        "?g biolink:category ?c } GROUP BY ?c",
        nodes, edges)
    assert [tuple(r) for r in out.collect()] == [(2, "biolink:GenomicEntity")]


def test_unsupported_shapes_raise(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError):
        sparql_select(spark, "ASK { ?s ?p ?o }", nodes, edges)
    with pytest.raises(SparqlError):
        sparql_select(spark, "SELECT ?x WHERE { }", nodes, edges)
    with pytest.raises(SparqlError):
        sparql_select(spark, "SELECT ?x WHERE { ?a ?b }", nodes, edges)


def _kg(spark):
    nodes = spark.createDataFrame(
        [("A:1", "cat1"), ("A:2", "cat2"), ("A:3", "cat1")],
        "id string, category string")
    edges = spark.createDataFrame(
        [("A:1", "rel:x", "A:2"), ("A:2", "rel:x", "A:2"),
         ("A:3", "rel:y", "A:1")],
        "subject string, predicate string, object string")
    return nodes, edges


def test_sparql_filter_eq_and_neq(spark):
    from ecokg_spark.query import sparql_select

    nodes, edges = _kg(spark)
    got = sparql_select(
        spark,
        'SELECT ?s ?o WHERE { ?s rel:x ?o . FILTER(?o = "A:2") '
        "FILTER(?s != A:2) }",
        nodes, edges).collect()
    assert [(r["s"], r["o"]) for r in got] == [("A:1", "A:2")]


def test_sparql_distinct(spark):
    from ecokg_spark.query import sparql_select

    nodes, edges = _kg(spark)
    got = sparql_select(
        spark,
        "SELECT DISTINCT ?cat WHERE { ?x biolink:category ?cat }",
        nodes, edges).collect()
    assert sorted(r["cat"] for r in got) == ["cat1", "cat2"]


def test_sparql_repeated_var_in_pattern_is_equality(spark):
    """?s ?p ?s must bind only self-loops (ADVICE r2: the equality
    constraint was silently dropped)."""
    from ecokg_spark.query import sparql_select

    nodes, edges = _kg(spark)
    got = sparql_select(
        spark, "SELECT ?s WHERE { ?s rel:x ?s }", nodes, edges).collect()
    assert [r["s"] for r in got] == ["A:2"]


def test_sparql_filter_on_unbound_var_raises(spark):
    import pytest as _pytest

    from ecokg_spark.query import SparqlError, sparql_select

    nodes, edges = _kg(spark)
    with _pytest.raises(SparqlError):
        sparql_select(spark,
                      'SELECT ?s WHERE { ?s rel:x ?o . FILTER(?zz = "1") }',
                      nodes, edges)


def test_optional_left_join(spark, kg):
    """OPTIONAL binds matched rows and leaves NULL where the optional
    pattern has no match (G:2 has no phenotype edge)."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?g ?p WHERE { ?g biolink:in_taxon T:1 . "
        "OPTIONAL { ?g biolink:has_phenotype ?p } }",
        nodes, edges)
    got = {r["g"]: r["p"] for r in out.collect()}
    assert got == {"G:1": "P:1", "G:2": None}


def test_optional_multi_pattern_group(spark, kg):
    """An OPTIONAL block with two patterns inner-joins within the block
    before the left join."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?g ?p ?cat WHERE { ?g biolink:in_taxon T:1 . OPTIONAL { "
        "?g biolink:has_phenotype ?p . ?p biolink:category ?cat } }",
        nodes, edges)
    got = {r["g"]: (r["p"], r["cat"]) for r in out.collect()}
    assert got == {"G:1": ("P:1", "biolink:PhenotypicFeature"),
                   "G:2": (None, None)}


def test_optional_rejects_disjoint(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="shares no variable"):
        sparql_select(
            spark,
            "SELECT ?g ?x WHERE { ?g biolink:in_taxon T:1 . "
            "OPTIONAL { ?x biolink:category ?c } }",
            nodes, edges).collect()


def test_optional_inner_filter_left_join_scope(spark, kg):
    """FILTER inside OPTIONAL is part of the LeftJoin condition (spec
    §6.1): a block solution failing the filter leaves the row with NULL
    optional bindings — NOT removed, which is what moving the filter
    outside would do."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?g ?p WHERE { ?g biolink:in_taxon ?t . OPTIONAL { "
        '?g biolink:has_phenotype ?p . FILTER(?p != "P:1") } }',
        nodes, edges)
    got = {r["g"]: r["p"] for r in out.collect()}
    # G:1 HAS a phenotype edge, but it fails the filter -> NULL, row kept
    assert got == {"G:1": None, "G:2": None}
    # contrast: the same filter OUTSIDE the block removes G:1 entirely
    outside = sparql_select(
        spark,
        "SELECT ?g ?p WHERE { ?g biolink:in_taxon ?t . OPTIONAL { "
        '?g biolink:has_phenotype ?p } FILTER(?p != "P:1") }',
        nodes, edges)
    assert {r["g"] for r in outside.collect()} == set()


def test_optional_inner_regex_filter(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?g ?p WHERE { ?g biolink:in_taxon ?t . OPTIONAL { "
        '?g biolink:has_phenotype ?p . FILTER regex(?p, "^P:") } }',
        nodes, edges)
    got = {r["g"]: r["p"] for r in out.collect()}
    assert got == {"G:1": "P:1", "G:2": None}


def test_optional_inner_filter_on_required_var_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="not bound in that block"):
        sparql_select(
            spark,
            "SELECT ?g WHERE { ?g biolink:in_taxon ?t . OPTIONAL { "
            '?g biolink:has_phenotype ?p . FILTER(?t = "T:1") } }',
            nodes, edges)


def test_order_by_limit(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?n ?cat WHERE { ?n biolink:category ?cat } "
        "ORDER BY DESC(?n) LIMIT 2",
        nodes, edges)
    assert [tuple(r) for r in out.collect()] == [
        ("T:1", "biolink:OrganismTaxon"), ("P:1", "biolink:PhenotypicFeature")]


def test_order_by_agg_alias(spark, kg):
    """ORDER BY may name the COUNT alias (a projected, not pattern-bound,
    variable)."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT (COUNT(?n) AS ?c) ?cat WHERE { ?n biolink:category ?cat } "
        "GROUP BY ?cat ORDER BY DESC(?c) ASC(?cat) LIMIT 1",
        nodes, edges)
    assert [tuple(r) for r in out.collect()] == [(2, "biolink:GenomicEntity")]


def test_order_by_unprojected_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="unprojected"):
        sparql_select(
            spark,
            "SELECT ?cat WHERE { ?n biolink:category ?cat } ORDER BY ?n",
            nodes, edges)


def test_union_two_branches(spark, kg):
    """UNION = bag union of branch solutions; both branches bind ?x ?v."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x ?v WHERE { { ?x biolink:category ?v } UNION "
        "{ ?x biolink:in_taxon ?v } }",
        nodes, edges)
    got = sorted(tuple(r) for r in out.collect())
    assert got == sorted([
        ("G:1", "biolink:GenomicEntity"), ("G:2", "biolink:GenomicEntity"),
        ("T:1", "biolink:OrganismTaxon"), ("P:1", "biolink:PhenotypicFeature"),
        ("G:1", "T:1"), ("G:2", "T:1")])


def test_union_null_aligns_missing_branch_vars(spark, kg):
    """A variable bound in only one branch is NULL for the other branch's
    rows (SPARQL solution-mapping alignment)."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x ?cat ?tax WHERE { { ?x biolink:category ?cat } UNION "
        "{ ?x biolink:in_taxon ?tax } }",
        nodes, edges)
    rows = [tuple(r) for r in out.collect()]
    assert ("G:1", "biolink:GenomicEntity", None) in rows
    assert ("G:1", None, "T:1") in rows
    assert len(rows) == 6


def test_union_joins_required_pattern(spark, kg):
    """A union block joins the required patterns on its shared variable."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x ?v WHERE { ?x biolink:in_taxon T:1 . "
        "{ ?x biolink:category ?v } UNION { ?x biolink:has_phenotype ?v } }",
        nodes, edges)
    got = sorted(tuple(r) for r in out.collect())
    assert got == sorted([
        ("G:1", "biolink:GenomicEntity"), ("G:2", "biolink:GenomicEntity"),
        ("G:1", "P:1")])


def test_union_three_branches(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x WHERE { { ?x biolink:category biolink:OrganismTaxon } "
        "UNION { ?x biolink:category biolink:PhenotypicFeature } "
        "UNION { ?x biolink:has_phenotype P:1 } }",
        nodes, edges)
    assert sorted(r["x"] for r in out.collect()) == ["G:1", "P:1", "T:1"]


def test_union_partial_join_var_rejected(spark, kg):
    """A join-shared variable bound by only SOME branches must error, not
    silently NULL-drop (unbound-is-compatible semantics unsupported)."""
    nodes, edges = kg
    with pytest.raises(SparqlError, match="partially"):
        sparql_select(
            spark,
            "SELECT ?x ?v WHERE { ?x biolink:in_taxon T:1 . "
            "{ ?x biolink:category ?v } UNION { ?y biolink:has_phenotype ?v } }",
            nodes, edges)


def test_values_in_filter(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x ?cat WHERE { ?x biolink:category ?cat . "
        "VALUES ?cat { biolink:GenomicEntity biolink:OrganismTaxon } }",
        nodes, edges)
    assert sorted(r["x"] for r in out.collect()) == ["G:1", "G:2", "T:1"]


def test_values_quoted_literals_and_errors(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?x WHERE { ?x biolink:category ?cat . '
        'VALUES ?cat { "biolink:OrganismTaxon" } }',
        nodes, edges)
    assert [r["x"] for r in out.collect()] == ["T:1"]
    with pytest.raises(SparqlError, match="unbound"):
        sparql_select(
            spark,
            "SELECT ?x WHERE { ?x biolink:category ?cat . "
            "VALUES ?other { z } }",
            nodes, edges)
    with pytest.raises(SparqlError, match="duplicate"):
        sparql_select(
            spark,
            "SELECT ?x WHERE { ?x biolink:category ?cat . "
            "VALUES ?cat { a a } }",
            nodes, edges)


@pytest.fixture()
def chain_kg(spark):
    """a -> b -> c -> d subclass chain + one unrelated edge."""
    nodes = spark.createDataFrame([], "id string, category string")
    edges = spark.createDataFrame(
        [("a", "biolink:subclass_of", "b"),
         ("b", "biolink:subclass_of", "c"),
         ("c", "biolink:subclass_of", "d"),
         ("a", "biolink:related_to", "d")],
        "subject string, predicate string, object string")
    return nodes, edges


def test_path_sequence_two_steps(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x ?y WHERE { ?x biolink:subclass_of/biolink:subclass_of ?y }",
        nodes, edges)
    assert sorted(map(tuple, out.collect())) == [("a", "c"), ("b", "d")]


def test_path_plus_transitive_closure(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x ?y WHERE { ?x biolink:subclass_of+ ?y }",
        nodes, edges)
    assert sorted(map(tuple, out.collect())) == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d")]


def test_path_plus_cycle_converges_to_all_pairs(spark):
    """Cyclic graph: closure must terminate (set semantics) — every node
    reaches every node including itself."""
    nodes = spark.createDataFrame([], "id string, category string")
    edges = spark.createDataFrame(
        [("a", "p:x", "b"), ("b", "p:x", "c"), ("c", "p:x", "a")],
        "subject string, predicate string, object string")
    out = sparql_select(
        spark, "SELECT ?x ?y WHERE { ?x p:x+ ?y }", nodes, edges)
    assert out.count() == 9


def test_path_joins_other_pattern_and_bound_endpoint(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x WHERE { ?x biolink:subclass_of+ d . "
        "?x biolink:related_to ?z }",
        nodes, edges)
    assert [r["x"] for r in out.collect()] == ["a"]


def test_path_rejects_variable_step_and_category(spark, chain_kg):
    nodes, edges = chain_kg
    with pytest.raises(SparqlError):
        sparql_select(spark, "SELECT ?x ?y WHERE { ?x biolink:subclass_of/?p ?y }",
                      nodes, edges)
    with pytest.raises(SparqlError):
        sparql_select(spark, "SELECT ?x ?y WHERE { ?x biolink:category+ ?y }",
                      nodes, edges)


def test_path_inverse_step(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark, "SELECT ?x ?y WHERE { ?x ^biolink:subclass_of ?y }",
        nodes, edges)
    assert sorted(map(tuple, out.collect())) == [
        ("b", "a"), ("c", "b"), ("d", "c")]


def test_path_inverse_in_sequence_siblings(spark):
    """p/^p = siblings-or-self: nodes sharing a parent."""
    nodes = spark.createDataFrame([], "id string, category string")
    edges = spark.createDataFrame(
        [("a", "p:up", "r"), ("b", "p:up", "r"), ("c", "p:up", "s")],
        "subject string, predicate string, object string")
    out = sparql_select(
        spark, "SELECT ?x ?y WHERE { ?x p:up/^p:up ?y }", nodes, edges)
    assert sorted(map(tuple, out.collect())) == [
        ("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"), ("c", "c")]


def test_path_inverse_plus(spark, chain_kg):
    """^p+ = closure of the inverse relation (descendants)."""
    nodes, edges = chain_kg
    out = sparql_select(
        spark, "SELECT ?y WHERE { d ^biolink:subclass_of+ ?y }",
        nodes, edges)
    assert sorted(r["y"] for r in out.collect()) == ["a", "b", "c"]


def test_path_star_includes_zero_length(spark, chain_kg):
    """a p* ?y = {a} union everything reachable; zero-length binds the
    bound endpoint to itself."""
    nodes, edges = chain_kg
    out = sparql_select(
        spark, "SELECT ?y WHERE { a biolink:subclass_of* ?y }",
        nodes, edges)
    assert sorted(r["y"] for r in out.collect()) == ["a", "b", "c", "d"]


def test_path_star_unbound_includes_all_terms(spark):
    nodes = spark.createDataFrame([("z", "cat")], "id string, category string")
    edges = spark.createDataFrame(
        [("a", "p:x", "b")], "subject string, predicate string, object string")
    out = sparql_select(
        spark, "SELECT ?x ?y WHERE { ?x p:x* ?y }", nodes, edges)
    # identity over ALL graph terms (incl. node-table id z) + the one edge
    assert sorted(map(tuple, out.collect())) == [
        ("a", "a"), ("a", "b"), ("b", "b"), ("z", "z")]


def test_path_question_zero_or_one(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark, "SELECT ?y WHERE { a biolink:subclass_of? ?y }",
        nodes, edges)
    assert sorted(r["y"] for r in out.collect()) == ["a", "b"]


def test_path_alternation(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x ?y WHERE "
        "{ ?x (biolink:subclass_of|biolink:related_to) ?y }",
        nodes, edges)
    assert sorted(map(tuple, out.collect())) == [
        ("a", "b"), ("a", "d"), ("b", "c"), ("c", "d")]


def test_path_alternation_with_inverse_branch_and_closure(spark, chain_kg):
    nodes, edges = chain_kg
    # (^subclass_of)+ from d reaches c, b, a; the alternation group takes a
    # closure modifier like any step
    out = sparql_select(
        spark,
        "SELECT ?x ?y WHERE "
        "{ ?x (^biolink:subclass_of|^biolink:related_to)+ ?y }",
        nodes, edges)
    pairs = set(map(tuple, out.collect()))
    # inverse closure of subclass chain: d->{c,b,a}, c->{b,a}, b->{a}
    assert {("d", "c"), ("d", "b"), ("d", "a"), ("c", "b"), ("c", "a"),
            ("b", "a")} <= pairs


def test_path_alternation_in_sequence(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x ?y WHERE "
        "{ ?x biolink:subclass_of/(biolink:subclass_of|biolink:related_to) ?y }",
        nodes, edges)
    assert sorted(map(tuple, out.collect())) == [("a", "c"), ("b", "d")]


def test_path_empty_alternation_rejected(spark, chain_kg):
    nodes, edges = chain_kg
    with pytest.raises(SparqlError):
        sparql_select(spark, "SELECT ?x ?y WHERE { ?x () ?y }",
                      nodes, edges)


# --------------------------------------------------------------------------
# round-4 grammar: alternation validation, NOT EXISTS, aggregates
# --------------------------------------------------------------------------

def test_path_alternation_rejects_closure_in_branch(spark, chain_kg):
    """`(a+|b)` — a closure modifier inside an alternation branch is a
    grammar error, not a literal predicate named 'a+' (ADVICE r3)."""
    nodes, edges = chain_kg
    with pytest.raises(SparqlError, match="alternation branch"):
        sparql_select(
            spark,
            "SELECT ?x ?y WHERE "
            "{ ?x (biolink:subclass_of+|biolink:related_to) ?y }",
            nodes, edges)


def test_path_alternation_rejects_sequence_in_branch(spark, chain_kg):
    """`(a/b|c)` — the sequence split mangles the group into unbalanced
    fragments; must raise, not compile an always-empty filter (ADVICE r3)."""
    nodes, edges = chain_kg
    with pytest.raises(SparqlError, match="sequences inside"):
        sparql_select(
            spark,
            "SELECT ?x ?y WHERE "
            "{ ?x (biolink:subclass_of/biolink:related_to|biolink:related_to) ?y }",
            nodes, edges)


def test_not_exists_removes_matching_rows(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?g WHERE { ?g biolink:in_taxon T:1 . "
        "FILTER NOT EXISTS { ?g biolink:has_phenotype ?p } }",
        nodes, edges)
    # G:1 has a phenotype edge -> removed; G:2 survives
    assert [tuple(r) for r in out.collect()] == [("G:2",)]


def test_not_exists_requires_shared_variable(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="NOT EXISTS"):
        sparql_select(
            spark,
            "SELECT ?g WHERE { ?g biolink:in_taxon T:1 . "
            "FILTER NOT EXISTS { ?z biolink:has_phenotype ?p } }",
            nodes, edges)


def test_count_distinct_min_max_aggregates(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT (COUNT(DISTINCT ?g) AS ?n) (MIN(?t) AS ?lo) "
        "(MAX(?t) AS ?hi) WHERE { ?g biolink:in_taxon ?t } GROUP BY ?t",
        nodes, edges)
    assert out.columns == ["n", "lo", "hi"]
    assert [tuple(r) for r in out.collect()] == [(2, "T:1", "T:1")]


def test_distinct_inside_min_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="DISTINCT inside"):
        sparql_select(
            spark,
            "SELECT (MIN(DISTINCT ?t) AS ?lo) ?g WHERE "
            "{ ?g biolink:in_taxon ?t } GROUP BY ?g",
            nodes, edges)


# --------------------------------------------------------------------------
# property test: random BGPs, compiler vs DuckDB (VERDICT r3 next #8)
# --------------------------------------------------------------------------

def test_random_bgps_match_duckdb(spark, kg):
    """Seeded random basic graph patterns (2-4 triple patterns, optional
    equality FILTER, optional DISTINCT) compiled by sparql_select must
    return the same bag of rows as an independently-generated SQL
    translation run on DuckDB over the same tables — catches
    join-alignment and rename edge cases hand-written rows can't."""
    import random

    import duckdb

    nodes, edges = kg
    con = duckdb.connect()
    con.register("n", nodes.toPandas())
    con.register("e", edges.toPandas())

    CAT = "biolink:category"
    ids = ["G:1", "G:2", "T:1", "P:1"]
    preds = ["biolink:in_taxon", "biolink:has_phenotype"]
    cats = ["biolink:GenomicEntity", "biolink:OrganismTaxon"]
    var_pool = ["a", "b", "c", "d"]

    def gen_query(rng):
        n_pat = rng.randint(2, 4)
        patterns = []
        for _ in range(n_pat):
            p = rng.choice(preds + [CAT, "?" + rng.choice(var_pool)])
            s = rng.choice(ids + ["?" + rng.choice(var_pool)] * 3)
            if p == CAT:
                o = rng.choice(cats + ["?" + rng.choice(var_pool)] * 3)
            else:
                o = rng.choice(ids + ["?" + rng.choice(var_pool)] * 3)
            patterns.append((s, p, o))
        bound = []
        for s, p, o in patterns:
            for t in (s, p, o):
                if t.startswith("?") and t[1:] not in bound:
                    bound.append(t[1:])
        if not bound:
            return None
        k = rng.randint(1, len(bound))
        sel = rng.sample(bound, k)
        filters = []
        if rng.random() < 0.4:
            v = rng.choice(bound)
            filters.append((v, rng.choice(["=", "!="]),
                            rng.choice(ids + cats + preds)))
        distinct = rng.random() < 0.3
        return patterns, sel, filters, distinct

    def to_sparql(patterns, sel, filters, distinct):
        body = " . ".join(" ".join(t) for t in patterns)
        f = " ".join(f'FILTER(?{v} {op} {val})' for v, op, val in filters)
        d = "DISTINCT " if distinct else ""
        return (f"SELECT {d}{' '.join('?' + v for v in sel)} "
                f"WHERE {{ {body} {f} }}")

    def to_sql(patterns, sel, filters, distinct):
        froms, wheres = [], []
        first = {}
        for i, (s, p, o) in enumerate(patterns):
            if not p.startswith("?") and p == CAT:
                froms.append(f"(SELECT id AS s, category AS o FROM n) t{i}")
                cols = {"s": s, "o": o}
            else:
                froms.append(
                    f"(SELECT subject AS s, predicate AS p, object AS o"
                    f" FROM e) t{i}")
                cols = {"s": s, "p": p, "o": o}
            for c, term in cols.items():
                ref = f"t{i}.{c}"
                if term.startswith("?"):
                    v = term[1:]
                    if v in first:
                        wheres.append(f"{ref} = {first[v]}")
                    else:
                        first[v] = ref
                else:
                    wheres.append(f"{ref} = '{term}'")
        for v, op, val in filters:
            o = "=" if op == "=" else "<>"
            wheres.append(f"{first[v]} {o} '{val}'")
        d = "DISTINCT " if distinct else ""
        proj = ", ".join(f"{first[v]} AS {v}" for v in sel)
        w = (" WHERE " + " AND ".join(wheres)) if wheres else ""
        return f"SELECT {d}{proj} FROM {', '.join(froms)}{w}"

    checked = 0
    for seed in range(60):
        rng = random.Random(seed)
        g = gen_query(rng)
        if g is None:
            continue
        patterns, sel, filters, distinct = g
        sparql = to_sparql(patterns, sel, filters, distinct)
        got = sorted(tuple(r) for r in
                     sparql_select(spark, sparql, nodes, edges).collect())
        want = sorted(tuple(r) for r in
                      con.execute(to_sql(patterns, sel, filters,
                                         distinct)).fetchall())
        assert got == want, f"seed {seed}: {sparql}\n got {got}\nwant {want}"
        checked += 1
    assert checked >= 40


def test_bind_strafter_and_concat(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?g ?tax ?key WHERE { ?g biolink:in_taxon ?t . '
        'BIND(STRAFTER(?t, "T:") AS ?tax) '
        'BIND(LCASE(CONCAT(?g, "@", ?t)) AS ?key) }',
        nodes, edges)
    rows = {r["g"]: r for r in out.collect()}
    assert rows["G:1"]["tax"] == "1"
    assert rows["G:1"]["key"] == "g:1@t:1"
    assert set(out.columns) == {"g", "tax", "key"}


def test_bind_chained_and_strbefore_strlen(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?pfx ?n WHERE { ?g biolink:in_taxon ?t . '
        'BIND(STRBEFORE(?g, ":") AS ?pfx) '
        'BIND(STRLEN(?pfx) AS ?n) }',
        nodes, edges)
    rows = out.collect()
    assert all(r["pfx"] == "G" and r["n"] == 1 for r in rows)


def test_bind_missing_needle_yields_empty(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?g ?x WHERE { ?g biolink:in_taxon ?t . '
        'BIND(STRAFTER(?g, "ZZZ") AS ?x) }',
        nodes, edges)
    assert all(r["x"] == "" for r in out.collect())


def test_bind_unbound_variable_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="unbound"):
        sparql_select(
            spark,
            'SELECT ?x WHERE { ?g biolink:in_taxon ?t . '
            'BIND(UCASE(?nope) AS ?x) }',
            nodes, edges).collect()


def test_bind_rebind_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="rebind"):
        sparql_select(
            spark,
            'SELECT ?g WHERE { ?g biolink:in_taxon ?t . '
            'BIND(UCASE(?g) AS ?t) }',
            nodes, edges).collect()


def test_bind_unknown_function_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="unsupported BIND function"):
        sparql_select(
            spark,
            'SELECT ?x WHERE { ?g biolink:in_taxon ?t . '
            'BIND(MAGIC(?g) AS ?x) }',
            nodes, edges).collect()


def test_group_concat_sorted_with_separator(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT (GROUP_CONCAT(?g; SEPARATOR="|") AS ?gs) ?t '
        "WHERE { ?g biolink:in_taxon ?t } GROUP BY ?t",
        nodes, edges)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["gs"] == "G:1|G:2"    # sorted, joined on the separator
    assert rows[0]["t"] == "T:1"


def test_group_concat_default_separator_is_space(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT (GROUP_CONCAT(?g) AS ?gs) ?t "
        "WHERE { ?g biolink:in_taxon ?t } GROUP BY ?t",
        nodes, edges)
    assert out.collect()[0]["gs"] == "G:1 G:2"


def test_filter_regex_and_case_insensitive_flag(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?n ?cat WHERE { ?n biolink:category ?cat . '
        'FILTER regex(?cat, "organismtaxon$", "i") }',
        nodes, edges)
    assert {r["n"] for r in out.collect()} == {"T:1"}
    case_sensitive = sparql_select(
        spark,
        'SELECT ?n WHERE { ?n biolink:category ?cat . '
        'FILTER regex(?cat, "organismtaxon$") }',
        nodes, edges)
    assert case_sensitive.count() == 0


def test_filter_regex_bad_flags_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="regex flags"):
        sparql_select(
            spark,
            'SELECT ?n WHERE { ?n biolink:category ?cat . '
            'FILTER regex(?cat, "x", "gms") }',
            nodes, edges).collect()


def test_random_optional_inner_filters_match_duckdb(spark, kg):
    """Seeded random OPTIONAL blocks with inner equality/regex filters vs
    an independent DuckDB LEFT JOIN translation — the NULL-keeping
    LeftJoin-condition scoping must hold on arbitrary shapes, not just
    the hand-written rows."""
    import random

    import duckdb

    nodes, edges = kg
    con = duckdb.connect()
    con.register("n", nodes.toPandas())
    con.register("e", edges.toPandas())

    CAT = "biolink:category"
    preds = ["biolink:in_taxon", "biolink:has_phenotype"]
    vals = ["T:1", "P:1", "G:1"]
    pats = ["^P:", "^T:", ":1$", "^G"]

    checked = 0
    for seed in range(40):
        rng = random.Random(1000 + seed)
        p1 = rng.choice(preds)
        shared = rng.choice(["a", "b"])
        p3 = rng.choice(preds + [CAT])
        inner_eq = None
        if rng.random() < 0.5:
            inner_eq = (rng.choice(["=", "!="]), rng.choice(vals))
        inner_rx = rng.choice(pats) if rng.random() < 0.5 else None
        if inner_eq is None and inner_rx is None:
            inner_rx = rng.choice(pats)

        filt = ""
        if inner_eq:
            filt += f' FILTER(?o {inner_eq[0]} "{inner_eq[1]}")'
        if inner_rx:
            filt += f' FILTER regex(?o, "{inner_rx}")'
        sparql = (f"SELECT ?a ?b ?o WHERE {{ ?a {p1} ?b . "
                  f"OPTIONAL {{ ?{shared} {p3} ?o .{filt} }} }}")

        blk_src = ("(SELECT id AS s, category AS o FROM n)" if p3 == CAT
                   else f"(SELECT subject AS s, object AS o FROM e "
                        f"WHERE predicate = '{p3}')")
        conds = []
        if inner_eq:
            conds.append(f"o {'=' if inner_eq[0] == '=' else '<>'} "
                         f"'{inner_eq[1]}'")
        if inner_rx:
            conds.append(f"regexp_matches(o, '{inner_rx}')")
        where = (" WHERE " + " AND ".join(conds)) if conds else ""
        sql = (f"SELECT base.a, base.b, blk.o FROM "
               f"(SELECT subject AS a, object AS b FROM e "
               f" WHERE predicate = '{p1}') base "
               f"LEFT JOIN (SELECT s, o FROM {blk_src}{where}) blk "
               f"ON blk.s = base.{shared}")

        got = sorted(tuple(r) for r in
                     sparql_select(spark, sparql, nodes, edges).collect())
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"seed {seed}: {sparql}\n got {got}\nwant {want}"
        checked += 1
    assert checked >= 30


def test_union_branch_scoped_filter_and_bind_rejected(spark, kg):
    """A FILTER regex or BIND inside a UNION branch is branch-scoped in
    SPARQL; hoisting it to global post-join scope would silently apply it
    to ALL branches — reject, like equality FILTERs in that position."""
    nodes, edges = kg
    with pytest.raises(SparqlError):
        sparql_select(
            spark,
            "SELECT ?x ?y WHERE { { ?x biolink:in_taxon ?y . "
            'FILTER regex(?y, "^T") } UNION '
            "{ ?x biolink:has_phenotype ?y } }",
            nodes, edges)
    with pytest.raises(SparqlError):
        sparql_select(
            spark,
            "SELECT ?x ?y ?z WHERE { { ?x biolink:in_taxon ?y . "
            "BIND(UCASE(?y) AS ?z) } UNION "
            "{ ?x biolink:has_phenotype ?y } }",
            nodes, edges)


def test_group_concat_distinct_targeted_error(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="GROUP_CONCAT.DISTINCT"):
        sparql_select(
            spark,
            "SELECT (GROUP_CONCAT(DISTINCT ?g) AS ?gs) ?t "
            "WHERE { ?g biolink:in_taxon ?t } GROUP BY ?t",
            nodes, edges)


def test_exists_keeps_matching_rows(spark, kg):
    """FILTER EXISTS = left semi join on shared variables (spec §8.1.1):
    only subjects that DO have an in_taxon edge survive."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x WHERE { ?x biolink:category ?c . "
        "FILTER EXISTS { ?x biolink:in_taxon ?t } }",
        nodes, edges)
    assert sorted(r["x"] for r in out.collect()) == ["G:1", "G:2"]


def test_exists_requires_shared_variable(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="EXISTS group 0 shares no"):
        sparql_select(
            spark,
            "SELECT ?x WHERE { ?x biolink:category ?c . "
            "FILTER EXISTS { ?a biolink:in_taxon ?t } }",
            nodes, edges).collect()


def test_minus_removes_shared_variable_matches(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x WHERE { ?x biolink:category ?c . "
        "MINUS { ?x biolink:in_taxon ?t } }",
        nodes, edges)
    assert sorted(r["x"] for r in out.collect()) == ["P:1", "T:1"]


def test_minus_disjoint_domain_is_noop(spark, kg):
    """The spec's EXISTS-vs-MINUS divergence (§8.3.3): a MINUS group
    sharing no variable removes NOTHING (dom(μ1) ∩ dom(μ2) = ∅ means no
    inner solution overlaps), where NOT EXISTS would empty the result."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x WHERE { ?x biolink:category ?c . "
        "MINUS { ?a biolink:in_taxon ?t } }",
        nodes, edges)
    assert out.count() == 4  # all nodes kept


def test_sum_avg_aggregates(spark):
    nodes = spark.createDataFrame(
        [("D:1", "A"), ("D:2", "A"), ("D:3", "B")], "id string, category string")
    edges = spark.createDataFrame(
        [("D:1", "ex:w", "1.5"), ("D:2", "ex:w", "2.5"), ("D:3", "ex:w", "4.0")],
        "subject string, predicate string, object string")
    out = sparql_select(
        spark,
        "SELECT (SUM(?w) AS ?tot) (AVG(?w) AS ?mean) ?c WHERE "
        "{ ?x ex:w ?w . ?x biolink:category ?c } GROUP BY ?c",
        nodes, edges)
    got = {r["c"]: (r["tot"], r["mean"]) for r in out.collect()}
    assert got == {"A": (4.0, 2.0), "B": (4.0, 4.0)}


def test_sum_distinct_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="SUM\\(DISTINCT"):
        sparql_select(
            spark,
            "SELECT (SUM(DISTINCT ?w) AS ?t) WHERE { ?x ex:w ?w }",
            nodes, edges)


def test_having_filters_groups(spark, kg):
    """HAVING over an aggregate NOT in the SELECT list (hidden column)."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?c WHERE { ?x biolink:category ?c } GROUP BY ?c "
        "HAVING(COUNT(?x) > 1)",
        nodes, edges)
    assert [r["c"] for r in out.collect()] == ["biolink:GenomicEntity"]


def test_having_with_projected_aggregate(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT (COUNT(?x) AS ?n) ?c WHERE { ?x biolink:category ?c } "
        "GROUP BY ?c HAVING(COUNT(?x) <= 1) ORDER BY ?c",
        nodes, edges)
    assert [(r["n"], r["c"]) for r in out.collect()] == [
        (1, "biolink:OrganismTaxon"), (1, "biolink:PhenotypicFeature")]


def test_having_unsupported_expression_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="unsupported HAVING"):
        sparql_select(
            spark,
            "SELECT ?c WHERE { ?x biolink:category ?c } GROUP BY ?c "
            "HAVING(COUNT(?x) + 1 > 2)",
            nodes, edges)


def test_ask_true_and_false(spark, kg):
    from ecokg_spark.query import sparql_ask

    nodes, edges = kg
    t = sparql_ask(spark, "ASK { ?g biolink:in_taxon T:1 }", nodes, edges)
    assert t.columns == ["ask"] and t.collect()[0]["ask"] is True
    f = sparql_ask(spark, "ASK { ?g biolink:in_taxon T:99 }", nodes, edges)
    assert f.collect()[0]["ask"] is False


def test_ask_with_filter_and_quoted_literal(spark, kg):
    from ecokg_spark.query import sparql_ask

    nodes, edges = kg
    out = sparql_ask(
        spark, 'ASK { ?g biolink:in_taxon "T:1" . '
        'FILTER(?g = "G:2") }', nodes, edges)
    assert out.collect()[0]["ask"] is True


def test_construct_template_instantiation(spark, kg):
    from ecokg_spark.query import sparql_construct

    nodes, edges = kg
    out = sparql_construct(
        spark,
        "CONSTRUCT { ?g ex:taxon ?t . ?g ex:kind gene } "
        "WHERE { ?g biolink:in_taxon ?t }",
        nodes, edges)
    assert out.columns == ["subject", "predicate", "object"]
    got = sorted(tuple(r) for r in out.collect())
    assert got == [("G:1", "ex:kind", "gene"), ("G:1", "ex:taxon", "T:1"),
                   ("G:2", "ex:kind", "gene"), ("G:2", "ex:taxon", "T:1")]


def test_construct_drops_optional_null_instantiations(spark, kg):
    """Spec §16.2: a template triple with an unbound position is not
    instantiated — OPTIONAL-miss rows emit the required triple only."""
    from ecokg_spark.query import sparql_construct

    nodes, edges = kg
    out = sparql_construct(
        spark,
        "CONSTRUCT { ?g ex:seen yes . ?g ex:pheno ?p } "
        "WHERE { ?g biolink:in_taxon ?t . "
        "OPTIONAL { ?g biolink:has_phenotype ?p } }",
        nodes, edges)
    got = sorted(tuple(r) for r in out.collect())
    assert got == [("G:1", "ex:pheno", "P:1"), ("G:1", "ex:seen", "yes"),
                   ("G:2", "ex:seen", "yes")]


def test_construct_unbound_template_variable_rejected(spark, kg):
    from ecokg_spark.query import sparql_construct

    nodes, edges = kg
    with pytest.raises(SparqlError, match="unbound variable \\?z"):
        sparql_construct(
            spark,
            "CONSTRUCT { ?g ex:x ?z } WHERE { ?g biolink:in_taxon ?t }",
            nodes, edges)


def test_offset_skips_ordered_solutions(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x ?c WHERE { ?x biolink:category ?c } "
        "ORDER BY ?x LIMIT 2 OFFSET 1",
        nodes, edges)
    assert [r["x"] for r in out.collect()] == ["G:2", "P:1"]


def test_offset_without_order_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="OFFSET without ORDER BY"):
        sparql_select(
            spark,
            "SELECT ?x WHERE { ?x biolink:category ?c } OFFSET 1",
            nodes, edges)


def test_count_star_counts_solutions(spark, kg):
    """COUNT(*) counts solutions (spec §11.4.3.1), including rows where
    an OPTIONAL variable is NULL — COUNT(?v) would skip those."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT (COUNT(*) AS ?n) (COUNT(?p) AS ?np) WHERE "
        "{ ?x biolink:category ?c . "
        "OPTIONAL { ?x biolink:has_phenotype ?p } }",
        nodes, edges)
    r = out.collect()[0]
    assert r["n"] == 4 and r["np"] == 1


def test_filter_numeric_comparison(spark):
    """Ordering FILTER compares numerically when the literal is numeric;
    a non-numeric term is eliminated (SPARQL type-error semantics) —
    note '9' > '10' by codepoint, so this only passes numerically."""
    nodes = spark.createDataFrame([("X:1", "c")], "id string, category string")
    edges = spark.createDataFrame(
        [("X:1", "ex:w", "9"), ("X:2", "ex:w", "10"), ("X:3", "ex:w", "abc")],
        "subject string, predicate string, object string")
    out = sparql_select(
        spark, "SELECT ?x ?w WHERE { ?x ex:w ?w . FILTER(?w < 10) }",
        nodes, edges)
    assert [tuple(r) for r in out.collect()] == [("X:1", "9")]


def test_filter_codepoint_comparison_for_text(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?x WHERE { ?x biolink:category ?c . FILTER(?c >= "biolink:P") }',
        nodes, edges)
    assert sorted(r["x"] for r in out.collect()) == ["P:1"]


def test_filter_var_var_comparison(spark):
    """FILTER(?a != ?b) compares two bound terms (previously this shape
    silently compared against the literal string '?b')."""
    nodes = spark.createDataFrame([("X:1", "c")], "id string, category string")
    edges = spark.createDataFrame(
        [("X:1", "ex:a", "v1"), ("X:1", "ex:b", "v1"),
         ("X:2", "ex:a", "v1"), ("X:2", "ex:b", "v2")],
        "subject string, predicate string, object string")
    out = sparql_select(
        spark,
        "SELECT ?x WHERE { ?x ex:a ?p . ?x ex:b ?q . FILTER(?p != ?q) }",
        nodes, edges)
    assert [r["x"] for r in out.collect()] == ["X:2"]
    eq = sparql_select(
        spark,
        "SELECT ?x WHERE { ?x ex:a ?p . ?x ex:b ?q . FILTER(?p = ?q) }",
        nodes, edges)
    assert [r["x"] for r in eq.collect()] == ["X:1"]


def test_filter_var_var_unbound_rejected(spark, kg):
    nodes, edges = kg
    with pytest.raises(SparqlError, match="unbound or malformed"):
        sparql_select(
            spark,
            "SELECT ?x WHERE { ?x biolink:category ?c . FILTER(?c = ?zz) }",
            nodes, edges).collect()


# --------------------------------------------------------------------------
# round-4 batch 12: negated property sets
# --------------------------------------------------------------------------

def test_negated_property_set_single(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x ?y WHERE { ?x !biolink:related_to ?y }",
        nodes, edges)
    assert sorted(map(tuple, out.collect())) == [
        ("a", "b"), ("b", "c"), ("c", "d")]


def test_negated_property_set_group_and_modifiers(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x ?y WHERE "
        "{ ?x !(biolink:related_to|biolink:nonexistent) ?y }",
        nodes, edges)
    assert sorted(map(tuple, out.collect())) == [
        ("a", "b"), ("b", "c"), ("c", "d")]
    # step-level inverse + closure compose with negation: ^!(related_to)+
    inv = sparql_select(
        spark,
        "SELECT ?x ?y WHERE { ?x ^!(biolink:related_to)+ ?y }",
        nodes, edges)
    assert {("d", "a"), ("d", "b"), ("d", "c")} <= set(map(tuple, inv.collect()))


def test_negated_property_set_in_sequence(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x ?y WHERE "
        "{ ?x biolink:subclass_of/!biolink:related_to ?y }",
        nodes, edges)
    assert sorted(map(tuple, out.collect())) == [("a", "c"), ("b", "d")]


def test_negated_property_set_rejects_bad_items(spark, chain_kg):
    nodes, edges = chain_kg
    for q in (
        "SELECT ?x ?y WHERE { ?x !(^biolink:related_to) ?y }",   # reverse item
        "SELECT ?x ?y WHERE { ?x !(a/b) ?y }",                   # sequence item
        "SELECT ?x ?y WHERE { ?x !() ?y }",                      # empty set
    ):
        with pytest.raises(SparqlError):
            sparql_select(spark, q, nodes, edges)


# --------------------------------------------------------------------------
# round-4 batch 14: subqueries (spec §12)
# --------------------------------------------------------------------------

def test_subquery_aggregate_joins_on_shared_var(spark, chain_kg):
    nodes, edges = chain_kg
    # per-object in-degree over ALL edges, joined back to subclass pairs
    out = sparql_select(
        spark,
        "SELECT ?x ?y ?n WHERE { ?x biolink:subclass_of ?y . "
        "{ SELECT (COUNT(?s) AS ?n) ?y WHERE { ?s ?p ?y } GROUP BY ?y } }",
        nodes, edges)
    got = sorted(map(tuple, out.collect()))
    # in-degrees: b<-a (1), c<-b (1), d<-c,d<-a (2)
    assert got == [("a", "b", 1), ("b", "c", 1), ("c", "d", 2)]


def test_subquery_global_aggregate_cross_product(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x ?total WHERE { ?x biolink:subclass_of ?y . "
        "{ SELECT (COUNT(?s) AS ?total) WHERE { ?s ?p ?o } } }",
        nodes, edges)
    got = sorted(map(tuple, out.collect()))
    assert got == [("a", 4), ("b", 4), ("c", 4)]


def test_subquery_filter_on_projected_aggregate(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?y ?n WHERE { "
        "{ SELECT (COUNT(?s) AS ?n) ?y WHERE { ?s ?p ?y } GROUP BY ?y } "
        "FILTER(?n > 1) }",
        nodes, edges)
    assert [tuple(r) for r in out.collect()] == [("d", 2)]


def test_subquery_projection_scopes_variables(spark, chain_kg):
    nodes, edges = chain_kg
    # ?s is NOT projected by the subquery, so the outer query cannot see it
    with pytest.raises(SparqlError, match="unbound"):
        sparql_select(
            spark,
            "SELECT ?s WHERE { "
            "{ SELECT ?y WHERE { ?s biolink:subclass_of ?y } } }",
            nodes, edges).collect()


def test_subquery_plain_select_semijoins(spark, chain_kg):
    nodes, edges = chain_kg
    out = sparql_select(
        spark,
        "SELECT ?x ?y WHERE { ?x biolink:subclass_of ?y . "
        "{ SELECT ?x WHERE { ?x biolink:related_to ?d } } }",
        nodes, edges)
    # subquery binds ?x = a (the only related_to subject)
    assert [tuple(r) for r in out.collect()] == [("a", "b")]


def test_subquery_inside_optional_rejected(spark, chain_kg):
    nodes, edges = chain_kg
    # a subquery nested in OPTIONAL must not be hoisted to outer scope —
    # the depth guard leaves it in place and the block parser diagnoses it
    with pytest.raises(SparqlError):
        sparql_select(
            spark,
            "SELECT ?x WHERE { ?x biolink:subclass_of ?y . "
            "OPTIONAL { { SELECT ?x WHERE { ?x biolink:related_to ?d } } } }",
            nodes, edges)


# --------------------------------------------------------------------------
# multi-variable VALUES (inline solution table)
# --------------------------------------------------------------------------

def test_values_multi_joins_on_both_vars(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?x ?cat WHERE { ?x biolink:category ?cat . "
        "VALUES ( ?x ?cat ) { (G:1 biolink:GenomicEntity) "
        '(T:1 "biolink:OrganismTaxon") (G:2 biolink:OrganismTaxon) } }',
        nodes, edges)
    # (G:2, OrganismTaxon) matches no data row; quoted + bare literals mix
    assert sorted((r["x"], r["cat"]) for r in out.collect()) == [
        ("G:1", "biolink:GenomicEntity"), ("T:1", "biolink:OrganismTaxon")]


def test_values_multi_errors(spark, kg):
    nodes, edges = kg
    # UNDEF is now the spec wildcard: (G:1 UNDEF) pins only ?x
    out = sparql_select(
        spark,
        "SELECT ?x WHERE { ?x biolink:category ?cat . "
        "VALUES ( ?x ?cat ) { (G:1 UNDEF) } }",
        nodes, edges)
    assert {r["x"] for r in out.collect()} == {"G:1"}
    with pytest.raises(SparqlError, match="entries for"):
        sparql_select(
            spark,
            "SELECT ?x WHERE { ?x biolink:category ?cat . "
            "VALUES ( ?x ?cat ) { (G:1) } }",
            nodes, edges)
    with pytest.raises(SparqlError, match="duplicate"):
        sparql_select(
            spark,
            "SELECT ?x WHERE { ?x biolink:category ?cat . "
            "VALUES ( ?x ?cat ) { (G:1 a) (G:1 a) } }",
            nodes, edges)
    with pytest.raises(SparqlError, match="unbound"):
        sparql_select(
            spark,
            "SELECT ?x WHERE { ?x biolink:category ?cat . "
            "VALUES ( ?x ?nope ) { (G:1 a) } }",
            nodes, edges)


# --------------------------------------------------------------------------
# SAMPLE aggregate
# --------------------------------------------------------------------------

def test_sample_aggregate_is_deterministic_min(spark, kg):
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?t (SAMPLE(?g) AS ?one) (COUNT(?g) AS ?n) WHERE { "
        "?g biolink:in_taxon ?t } GROUP BY ?t",
        nodes, edges)
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0]["t"], rows[0]["one"], rows[0]["n"]) == ("T:1", "G:1", 2)
    with pytest.raises(SparqlError, match="no-op"):
        sparql_select(
            spark,
            "SELECT (SAMPLE(DISTINCT ?g) AS ?one) WHERE { "
            "?g biolink:in_taxon ?t }",
            nodes, edges)


def test_filter_strfuncs(spark, kg):
    from ecokg_spark.query import sparql_select

    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?x ?c WHERE { ?x biolink:category ?c . '
        'FILTER( STRSTARTS(?c, "biolink:Gen") ) }',
        nodes, edges)
    rows = out.collect()
    assert rows and all(r["c"].startswith("biolink:Gen") for r in rows)

    out2 = sparql_select(
        spark,
        'SELECT ?x ?c WHERE { ?x biolink:category ?c . '
        'FILTER( CONTAINS(?c, "Taxon") ) . FILTER( STRENDS(?x, "1") ) }',
        nodes, edges)
    rows2 = out2.collect()
    assert rows2
    for r in rows2:
        assert "Taxon" in r["c"] and r["x"].endswith("1")


def test_filter_in_notin(spark, kg):
    from ecokg_spark.query import sparql_select

    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?x ?c WHERE { ?x biolink:category ?c . '
        'FILTER( ?c IN ("biolink:GenomicEntity", "biolink:OrganismTaxon") ) }',
        nodes, edges)
    cats = {r["c"] for r in out.collect()}
    assert cats == {"biolink:GenomicEntity", "biolink:OrganismTaxon"}

    out2 = sparql_select(
        spark,
        'SELECT ?x ?c WHERE { ?x biolink:category ?c . '
        'FILTER( ?c NOT IN ("biolink:GenomicEntity") ) }',
        nodes, edges)
    rows3 = out2.collect()
    assert rows3
    assert all(r["c"] != "biolink:GenomicEntity" for r in rows3)


def test_filter_in_empty_list_rejected(spark, kg):
    import pytest as _pytest

    from ecokg_spark.query import SparqlError, sparql_select

    nodes, edges = kg
    with _pytest.raises(SparqlError):
        sparql_select(
            spark,
            'SELECT ?x WHERE { ?x biolink:category ?c . '
            'FILTER( ?c IN () ) }',
            nodes, edges)


def test_sparql_describe(spark, kg):
    from ecokg_spark.query import sparql_describe

    nodes, edges = kg
    out = sparql_describe(
        spark,
        'DESCRIBE ?x WHERE { ?x biolink:in_taxon T:1 }',
        nodes, edges)
    got = {tuple(r) for r in out.collect()}
    # every edge touching G:1 or G:2 (as subject OR object) + categories
    assert ("G:1", "biolink:in_taxon", "T:1") in got
    assert ("G:2", "biolink:in_taxon", "T:1") in got
    assert ("G:1", "biolink:has_phenotype", "P:1") in got
    assert ("G:1", "biolink:category", "biolink:GenomicEntity") in got
    assert ("G:2", "biolink:category", "biolink:GenomicEntity") in got
    # T:1 itself was not described
    assert ("T:1", "biolink:category", "biolink:OrganismTaxon") not in got


def test_sparql_describe_unbound_rejected(spark, kg):
    import pytest as _pytest

    from ecokg_spark.query import SparqlError, sparql_describe

    nodes, edges = kg
    with _pytest.raises(SparqlError):
        sparql_describe(spark,
                        'DESCRIBE ?z WHERE { ?x biolink:in_taxon T:1 }',
                        nodes, edges)


def test_bind_if_coalesce_bound(spark, kg):
    from ecokg_spark.query import sparql_select

    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?x ?k WHERE { ?x biolink:category ?c . '
        'BIND( IF(?c = "biolink:GenomicEntity", "gene", "other") AS ?k ) }',
        nodes, edges)
    got = {r["x"]: r["k"] for r in out.collect()}
    assert got["G:1"] == "gene" and got["G:2"] == "gene"
    assert got["T:1"] == "other" and got["P:1"] == "other"

    # BOUND over an OPTIONAL-miss + COALESCE default
    out2 = sparql_select(
        spark,
        'SELECT ?x ?p ?has WHERE { ?x biolink:in_taxon T:1 . '
        'OPTIONAL { ?x biolink:has_phenotype ?p } . '
        'BIND( IF(BOUND(?p), "yes", "no") AS ?has ) }',
        nodes, edges)
    got2 = {r["x"]: (r["p"], r["has"]) for r in out2.collect()}
    assert got2["G:1"] == ("P:1", "yes")
    assert got2["G:2"] == (None, "no")

    out3 = sparql_select(
        spark,
        'SELECT ?x ?v WHERE { ?x biolink:in_taxon T:1 . '
        'OPTIONAL { ?x biolink:has_phenotype ?p } . '
        'BIND( COALESCE(?p, "none") AS ?v ) }',
        nodes, edges)
    got3 = {r["x"]: r["v"] for r in out3.collect()}
    assert got3 == {"G:1": "P:1", "G:2": "none"}


def test_bind_if_bad_condition_rejected(spark, kg):
    import pytest as _pytest

    from ecokg_spark.query import SparqlError, sparql_select

    nodes, edges = kg
    with _pytest.raises(SparqlError):
        sparql_select(
            spark,
            'SELECT ?x WHERE { ?x biolink:category ?c . '
            'BIND( IF(?c, "a", "b") AS ?k ) }',
            nodes, edges)


def test_values_multi_undef_wildcard(spark, kg):
    from ecokg_spark.query import sparql_select

    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT ?x ?c WHERE { ?x biolink:category ?c . '
        'VALUES ( ?x ?c ) { '
        '( G:1 "biolink:GenomicEntity" ) '
        '( UNDEF "biolink:OrganismTaxon" ) } }',
        nodes, edges)
    got = {(r["x"], r["c"]) for r in out.collect()}
    # row 1 pins both vars; row 2 leaves ?x free (any taxon node)
    assert got == {("G:1", "biolink:GenomicEntity"),
                   ("T:1", "biolink:OrganismTaxon")}


def test_group_by_expression(spark, kg):
    """GROUP BY (expr AS ?var) — spec §10 expression keys desugar to an
    implicit BIND; the alias is projectable alongside aggregates."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        'SELECT (COUNT(?s) AS ?n) ?prefix WHERE { ?s biolink:category ?c } '
        'GROUP BY (SUBSTR(?s, 1, 1) AS ?prefix)',
        nodes, edges)
    assert out.columns == ["n", "prefix"]
    got = {r["prefix"]: r["n"] for r in out.collect()}
    assert got == {"G": 2, "T": 1, "P": 1}


def test_order_by_multikey_mixed(spark, kg):
    """ORDER BY with two keys, mixed ASC/DESC."""
    nodes, edges = kg
    out = sparql_select(
        spark,
        "SELECT ?s ?o WHERE { ?s ?p ?o } ORDER BY DESC(?o) ?s LIMIT 4",
        nodes, edges)
    rows = [tuple(r) for r in out.collect()]
    assert rows == sorted(rows, key=lambda r: (tuple(-ord(c) for c in r[1]), r[0]))[:4]


def test_random_optionals_match_duckdb(spark, kg):
    """Seeded random BGPs with an OPTIONAL block (one pattern sharing at
    least one variable with the required part) compiled by sparql_select
    must return the same bag of rows as an independent LEFT-JOIN SQL
    translation on DuckDB — the left-join alignment and NULL-binding
    cases the hand-written OPTIONAL tests sample only pointwise."""
    import random
    from collections import Counter

    import duckdb

    nodes, edges = kg
    con = duckdb.connect()
    con.register("n", nodes.toPandas())
    con.register("e", edges.toPandas())

    CAT = "biolink:category"
    ids = ["G:1", "G:2", "T:1", "P:1"]
    preds = ["biolink:in_taxon", "biolink:has_phenotype"]
    cats = ["biolink:GenomicEntity", "biolink:OrganismTaxon"]
    var_pool = ["a", "b", "c"]

    def gen_pattern(rng, force_var=None):
        p = rng.choice(preds + [CAT])
        s = force_var or rng.choice(ids + ["?" + rng.choice(var_pool)] * 3)
        pool = cats if p == CAT else ids
        o = rng.choice(pool + ["?" + rng.choice(var_pool)] * 3)
        return (s, p, o)

    def pat_vars(pats):
        out = []
        for t in pats:
            for x in t:
                if x.startswith("?") and x[1:] not in out:
                    out.append(x[1:])
        return out

    def to_sql_block(pats, alias):
        """One conjunctive block -> (subquery_sql, {var: col}) with one
        output column per variable."""
        froms, wheres, first = [], [], {}
        for i, (s, p, o) in enumerate(pats):
            if p == CAT:
                froms.append(f"(SELECT id AS s, category AS o FROM n) "
                             f"{alias}{i}")
                cols = {"s": s, "o": o}
            else:
                froms.append(f"(SELECT subject AS s, predicate AS p, "
                             f"object AS o FROM e) {alias}{i}")
                cols = {"s": s, "p": p, "o": o}
            for c, term in cols.items():
                ref = f"{alias}{i}.{c}"
                if term.startswith("?"):
                    v = term[1:]
                    if v in first:
                        wheres.append(f"{ref} = {first[v]}")
                    else:
                        first[v] = ref
                else:
                    wheres.append(f"{ref} = '{term}'")
        proj = ", ".join(f"{ref} AS {v}" for v, ref in first.items())
        w = (" WHERE " + " AND ".join(wheres)) if wheres else ""
        return (f"(SELECT {proj} FROM {', '.join(froms)}{w})", list(first))

    checked = 0
    for seed in range(80):
        rng = random.Random(10_000 + seed)
        req = [gen_pattern(rng) for _ in range(rng.randint(1, 3))]
        req_vars = pat_vars(req)
        if not req_vars:
            continue
        # the OPTIONAL pattern must share a variable with the required part
        shared_var = rng.choice(req_vars)
        opt = [gen_pattern(rng, force_var="?" + shared_var)]
        opt_vars = pat_vars(opt)
        sel = rng.sample(req_vars, rng.randint(1, len(req_vars)))
        opt_only = [v for v in opt_vars if v not in req_vars]
        if opt_only and rng.random() < 0.7:
            sel = sel + [rng.choice(opt_only)]

        body = " . ".join(" ".join(t) for t in req)
        obody = " . ".join(" ".join(t) for t in opt)
        sparql = (f"SELECT {' '.join('?' + v for v in sel)} "
                  f"WHERE {{ {body} OPTIONAL {{ {obody} }} }}")

        rsql, rvars = to_sql_block(req, "r")
        osql, ovars = to_sql_block(opt, "o_")
        join_on = " AND ".join(
            f"req.{v} = opt.{v}" for v in rvars if v in ovars)
        proj = ", ".join(
            (f"req.{v} AS {v}" if v in rvars else f"opt.{v} AS {v}")
            for v in sel)
        sql = (f"SELECT {proj} FROM {rsql} req LEFT JOIN {osql} opt "
               f"ON {join_on}")

        got = Counter(tuple(r) for r in
                      sparql_select(spark, sparql, nodes, edges).collect())
        want = Counter(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"seed {seed}: {sparql}\nSQL: {sql}"
        checked += 1
    assert checked >= 50


def test_random_unions_match_duckdb(spark, kg):
    """Seeded random queries with a 2-branch UNION block (each branch
    binding the join variable; branch-only variables NULL-aligned)
    compiled by sparql_select must match an independent UNION ALL + JOIN
    SQL translation bag-for-bag — alignment, bag semantics, and the
    NULL-fill for branch-missing variables."""
    import random
    from collections import Counter

    import duckdb

    nodes, edges = kg
    con = duckdb.connect()
    con.register("n", nodes.toPandas())
    con.register("e", edges.toPandas())

    CAT = "biolink:category"
    ids = ["G:1", "G:2", "T:1", "P:1"]
    preds = ["biolink:in_taxon", "biolink:has_phenotype"]
    cats = ["biolink:GenomicEntity", "biolink:OrganismTaxon"]
    var_pool = ["a", "b", "c"]

    def gen_pattern(rng, force_var=None):
        p = rng.choice(preds + [CAT])
        s = force_var or rng.choice(ids + ["?" + rng.choice(var_pool)] * 3)
        pool = cats if p == CAT else ids
        o = rng.choice(pool + ["?" + rng.choice(var_pool)] * 3)
        return (s, p, o)

    def pat_vars(pats):
        out = []
        for t in pats:
            for x in t:
                if x.startswith("?") and x[1:] not in out:
                    out.append(x[1:])
        return out

    def to_sql_block(pats, alias):
        froms, wheres, first = [], [], {}
        for i, (s, p, o) in enumerate(pats):
            if p == CAT:
                froms.append(f"(SELECT id AS s, category AS o FROM n) "
                             f"{alias}{i}")
                cols = {"s": s, "o": o}
            else:
                froms.append(f"(SELECT subject AS s, predicate AS p, "
                             f"object AS o FROM e) {alias}{i}")
                cols = {"s": s, "p": p, "o": o}
            for c, term in cols.items():
                ref = f"{alias}{i}.{c}"
                if term.startswith("?"):
                    v = term[1:]
                    if v in first:
                        wheres.append(f"{ref} = {first[v]}")
                    else:
                        first[v] = ref
                else:
                    wheres.append(f"{ref} = '{term}'")
        w = (" WHERE " + " AND ".join(wheres)) if wheres else ""
        return froms, w, first

    checked = 0
    for seed in range(80):
        rng = random.Random(20_000 + seed)
        req = [gen_pattern(rng) for _ in range(rng.randint(1, 2))]
        req_vars = pat_vars(req)
        if not req_vars:
            continue
        shared_var = rng.choice(req_vars)
        # both branches bind the shared variable (the compiler rejects
        # partial binding of a join variable by design)
        b1 = [gen_pattern(rng, force_var="?" + shared_var)]
        b2 = [gen_pattern(rng, force_var="?" + shared_var)]
        union_vars = sorted(set(pat_vars(b1)) | set(pat_vars(b2)))
        # skip seeds where a second shared-with-required var is only
        # partially bound (the compiler raises SparqlError for those)
        partial = [v for v in union_vars if v in req_vars and v != shared_var
                   and (v not in pat_vars(b1) or v not in pat_vars(b2))]
        if partial:
            continue
        sel = rng.sample(req_vars, rng.randint(1, len(req_vars)))
        extra = [v for v in union_vars if v not in req_vars]
        if extra and rng.random() < 0.7:
            sel = sel + [rng.choice(extra)]

        body = " . ".join(" ".join(t) for t in req)
        u1 = " . ".join(" ".join(t) for t in b1)
        u2 = " . ".join(" ".join(t) for t in b2)
        sparql = (f"SELECT {' '.join('?' + v for v in sel)} "
                  f"WHERE {{ {body} {{ {u1} }} UNION {{ {u2} }} }}")

        rfroms, rw, rfirst = to_sql_block(req, "r")
        rsql = (f"(SELECT {', '.join(f'{ref} AS {v}' for v, ref in rfirst.items())} "
                f"FROM {', '.join(rfroms)}{rw})")
        branch_sqls = []
        for alias, b in (("x", b1), ("y", b2)):
            bf, bw, bfirst = to_sql_block(b, alias)
            cols = ", ".join(
                (f"{bfirst[v]} AS {v}" if v in bfirst else f"NULL AS {v}")
                for v in union_vars)
            branch_sqls.append(f"SELECT {cols} FROM {', '.join(bf)}{bw}")
        usql = "(" + " UNION ALL ".join(branch_sqls) + ")"
        join_on = " AND ".join(
            f"req.{v} = u.{v}" for v in union_vars if v in rfirst)
        proj = ", ".join(
            (f"req.{v} AS {v}" if v in rfirst else f"u.{v} AS {v}")
            for v in sel)
        sql = f"SELECT {proj} FROM {rsql} req JOIN {usql} u ON {join_on}"

        got = Counter(tuple(r) for r in
                      sparql_select(spark, sparql, nodes, edges).collect())
        want = Counter(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"seed {seed}: {sparql}\nSQL: {sql}"
        checked += 1
    assert checked >= 40


def test_random_group_by_aggregates_match_duckdb(spark, kg):
    """Seeded random aggregate queries — GROUP BY one pattern-bound
    variable with COUNT / COUNT DISTINCT / MIN / MAX over another —
    compiled by sparql_select must match an independent SQL GROUP BY
    translation bag-for-bag."""
    import random
    from collections import Counter

    import duckdb

    nodes, edges = kg
    con = duckdb.connect()
    con.register("n", nodes.toPandas())
    con.register("e", edges.toPandas())

    CAT = "biolink:category"
    ids = ["G:1", "G:2", "T:1", "P:1"]
    preds = ["biolink:in_taxon", "biolink:has_phenotype"]
    cats = ["biolink:GenomicEntity", "biolink:OrganismTaxon"]
    var_pool = ["a", "b", "c"]

    def gen_pattern(rng):
        p = rng.choice(preds + [CAT])
        s = rng.choice(ids + ["?" + rng.choice(var_pool)] * 3)
        pool = cats if p == CAT else ids
        o = rng.choice(pool + ["?" + rng.choice(var_pool)] * 3)
        return (s, p, o)

    def to_sql_block(pats):
        froms, wheres, first = [], [], {}
        for i, (s, p, o) in enumerate(pats):
            if p == CAT:
                froms.append(f"(SELECT id AS s, category AS o FROM n) t{i}")
                cols = {"s": s, "o": o}
            else:
                froms.append(f"(SELECT subject AS s, predicate AS p, "
                             f"object AS o FROM e) t{i}")
                cols = {"s": s, "p": p, "o": o}
            for c, term in cols.items():
                ref = f"t{i}.{c}"
                if term.startswith("?"):
                    v = term[1:]
                    if v in first:
                        wheres.append(f"{ref} = {first[v]}")
                    else:
                        first[v] = ref
                else:
                    wheres.append(f"{ref} = '{term}'")
        w = (" WHERE " + " AND ".join(wheres)) if wheres else ""
        return froms, w, first

    AGGS = [
        ("COUNT(?{v})", "COUNT({r})"),
        ("COUNT(DISTINCT ?{v})", "COUNT(DISTINCT {r})"),
        ("MIN(?{v})", "MIN({r})"),
        ("MAX(?{v})", "MAX({r})"),
    ]

    checked = 0
    for seed in range(80):
        rng = random.Random(30_000 + seed)
        pats = [gen_pattern(rng) for _ in range(rng.randint(2, 3))]
        bound = []
        for t in pats:
            for x in t:
                if x.startswith("?") and x[1:] not in bound:
                    bound.append(x[1:])
        if len(bound) < 2:
            continue
        g, v = rng.sample(bound, 2)
        sp_agg, sql_agg = rng.choice(AGGS)

        body = " . ".join(" ".join(t) for t in pats)
        sparql = (f"SELECT ({sp_agg.format(v=v)} AS ?n) ?{g} "
                  f"WHERE {{ {body} }} GROUP BY ?{g}")

        froms, w, first = to_sql_block(pats)
        sql = (f"SELECT {sql_agg.format(r=first[v])} AS n, "
               f"{first[g]} AS {g} FROM {', '.join(froms)}{w} "
               f"GROUP BY {first[g]}")

        got = Counter(tuple(r) for r in
                      sparql_select(spark, sparql, nodes, edges).collect())
        want = Counter(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"seed {seed}: {sparql}\nSQL: {sql}"
        checked += 1
    assert checked >= 40


def test_random_property_paths_match_python_reference(spark):
    """Seeded random property-path queries — [^]pred with +/*/? modifiers,
    2-branch alternations, and 2-step sequences — over random small graphs,
    compared bag-for-bag against an independent Python evaluator of the
    documented semantics (closure duplicate-free and cycle-inclusive,
    zero-length binds every term, alternation bag-unions, sequences keep
    bag multiplicities through the midpoint join)."""
    import random
    from collections import Counter

    P1, P2 = "p:a", "p:b"

    def reach(pairs):
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
        out = set()
        for a in adj:
            seen, stack = set(), [*adj[a]]
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                stack.extend(adj.get(x, ()))
            out |= {(a, b) for b in seen}
        return out  # includes (a, a) reachable through a cycle

    def eval_unit(unit, E, terms):
        """unit = (branches, mod); branches = [(pred, inv)] (1 = plain
        step, 2 = alternation). Returns a Counter of (x, y) rows."""
        branches, mod = unit
        base = Counter()
        for pred, inv in branches:
            for s, p, o in E:
                if p == pred:
                    base[(o, s) if inv else (s, o)] += 1
        ident = {(t, t) for t in terms}
        if mod is None:
            return base
        if mod == "+":
            return Counter(reach(set(base)))
        if mod == "*":
            return Counter(reach(set(base)) | ident)
        return Counter(set(base) | ident)  # '?'

    def eval_path(units, E, terms):
        rel = eval_unit(units[0], E, terms)
        for u in units[1:]:
            nxt = eval_unit(u, E, terms)
            right = {}
            for (m, b), c in nxt.items():
                right.setdefault(m, []).append((b, c))
            out = Counter()
            for (a, m), c1 in rel.items():
                for b, c2 in right.get(m, ()):
                    out[(a, b)] += c1 * c2
            rel = out
        return rel

    def unit_to_sparql(unit):
        branches, mod = unit
        m = mod or ""
        if len(branches) == 1:
            pred, inv = branches[0]
            return f"{'^' if inv else ''}{pred}{m}"
        inner = "|".join(f"{'^' if inv else ''}{p}" for p, inv in branches)
        return f"({inner}){m}"

    checked = 0
    for seed in range(40):
        rng = random.Random(40_000 + seed)
        n_nodes = rng.randint(4, 8)
        names = [f"n:{i}" for i in range(n_nodes)]
        E = set()
        for _ in range(rng.randint(3, 12)):
            s, o = rng.sample(names, 2)  # no self-edges
            E.add((s, rng.choice([P1, P2]), o))
        E = sorted(E)
        # node table carries one extra id not in any edge (zero-length
        # paths must bind it too)
        nodes = spark.createDataFrame(
            [(nm, "biolink:NamedThing") for nm in [*names, "n:island"]],
            "id string, category string")
        edges = spark.createDataFrame(
            list(E), "subject string, predicate string, object string")
        terms = {s for s, _, _ in E} | {o for _, _, o in E} \
            | set(names) | {"n:island"}

        def gen_unit():
            if rng.random() < 0.3:
                branches = [(P1, rng.random() < 0.3),
                            (P2, rng.random() < 0.3)]
            else:
                branches = [(rng.choice([P1, P2]), rng.random() < 0.3)]
            mod = rng.choice([None, "+", "*", "?"])
            return (branches, mod)

        units = [gen_unit() for _ in range(rng.randint(1, 2))]
        path = "/".join(unit_to_sparql(u) for u in units)
        sparql = f"SELECT ?x ?y WHERE {{ ?x {path} ?y }}"

        got = Counter(tuple(r) for r in
                      sparql_select(spark, sparql, nodes, edges).collect())
        want = eval_path(units, E, terms)
        assert got == want, (f"seed {seed}: {sparql}\nE={E}\n"
                             f"extra got: {got - want}\nmissing: {want - got}")
        checked += 1
    assert checked == 40


def test_random_bind_exprs_match_duckdb(spark, kg):
    """Seeded random BIND expressions (CONCAT / UCASE / LCASE / STRLEN /
    SUBSTR / STRAFTER over pattern-bound variables) plus an optional
    string FILTER (STRSTARTS / STRENDS / CONTAINS), compared bag-for-bag
    against an independent DuckDB translation."""
    import random
    from collections import Counter

    import duckdb

    nodes, edges = kg
    con = duckdb.connect()
    con.register("n", nodes.toPandas())
    con.register("e", edges.toPandas())

    CAT = "biolink:category"
    ids = ["G:1", "G:2", "T:1", "P:1"]
    preds = ["biolink:in_taxon", "biolink:has_phenotype"]
    cats = ["biolink:GenomicEntity", "biolink:OrganismTaxon"]
    var_pool = ["a", "b"]

    def gen_pattern(rng):
        p = rng.choice(preds + [CAT])
        s = rng.choice(ids + ["?" + rng.choice(var_pool)] * 3)
        pool = cats if p == CAT else ids
        o = rng.choice(pool + ["?" + rng.choice(var_pool)] * 3)
        return (s, p, o)

    def to_sql_block(pats):
        froms, wheres, first = [], [], {}
        for i, (s, p, o) in enumerate(pats):
            if p == CAT:
                froms.append(f"(SELECT id AS s, category AS o FROM n) t{i}")
                cols = {"s": s, "o": o}
            else:
                froms.append(f"(SELECT subject AS s, predicate AS p, "
                             f"object AS o FROM e) t{i}")
                cols = {"s": s, "p": p, "o": o}
            for c, term in cols.items():
                ref = f"t{i}.{c}"
                if term.startswith("?"):
                    v = term[1:]
                    if v in first:
                        wheres.append(f"{ref} = {first[v]}")
                    else:
                        first[v] = ref
                else:
                    wheres.append(f"{ref} = '{term}'")
        return froms, wheres, first

    # (sparql template, duckdb template) over one variable reference
    EXPRS = [
        ('CONCAT(?{v}, "_x")', "{r} || '_x'"),
        ("UCASE(?{v})", "UPPER({r})"),
        ("LCASE(?{v})", "LOWER({r})"),
        ("STRLEN(?{v})", "CAST(LENGTH({r}) AS BIGINT)"),
        ("SUBSTR(?{v}, 2)", "SUBSTR({r}, 2)"),
        ("SUBSTR(?{v}, 1, 3)", "SUBSTR({r}, 1, 3)"),
        ('STRAFTER(?{v}, ":")', "CASE WHEN STRPOS({r}, ':') > 0 THEN "
                                "SUBSTR({r}, STRPOS({r}, ':') + 1) "
                                "ELSE '' END"),
    ]
    FILTS = [
        ('FILTER(STRSTARTS(?{v}, "G"))', "{r} LIKE 'G%'"),
        ('FILTER(STRENDS(?{v}, "1"))', "{r} LIKE '%1'"),
        ('FILTER(CONTAINS(?{v}, ":"))', "STRPOS({r}, ':') > 0"),
    ]

    checked = 0
    for seed in range(60):
        rng = random.Random(50_000 + seed)
        pats = [gen_pattern(rng) for _ in range(rng.randint(1, 2))]
        bound = []
        for t in pats:
            for x in t:
                if x.startswith("?") and x[1:] not in bound:
                    bound.append(x[1:])
        if not bound:
            continue
        v = rng.choice(bound)
        sp_expr, sql_expr = rng.choice(EXPRS)
        filt = rng.choice([None, *FILTS])

        body = " . ".join(" ".join(t) for t in pats)
        fv = rng.choice(bound)
        f_sp = filt[0].format(v=fv) if filt else ""
        sparql = (f"SELECT ?{v} ?z WHERE {{ {body} "
                  f"BIND({sp_expr.format(v=v)} AS ?z) {f_sp} }}")

        froms, wheres, first = to_sql_block(pats)
        if filt:
            wheres.append(filt[1].format(r=first[fv]))
        w = (" WHERE " + " AND ".join(wheres)) if wheres else ""
        sql = (f"SELECT {first[v]} AS v, {sql_expr.format(r=first[v])} AS z "
               f"FROM {', '.join(froms)}{w}")

        got = Counter(tuple(r) for r in
                      sparql_select(spark, sparql, nodes, edges).collect())
        want = Counter(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"seed {seed}: {sparql}\nSQL: {sql}"
        checked += 1
    assert checked >= 45
