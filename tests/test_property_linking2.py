"""Twentieth batch of independent pure-Python cross-checks: the entity
linking stage end-to-end — termlist explode, exact dictionary link,
nested-loop fuzzy resolution (edit-distance + deterministic tie-break),
quarantine, and the ambiguity report."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])

_STOP = ["about", "all", "the", "a", "an", "it", "this", "that", "and", "or"]


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _termlist_py(aliases):
    out = []
    for curie, name, cat, syn in aliases:
        if cat == "biolink:Publication" or name == "":
            continue
        terms = [name]
        for s in (syn.split("|") if syn is not None else []):
            if s not in terms:  # array_union dedups
                terms.append(s)
        for t in terms:
            if t != "":
                out.append((curie, t, t.strip().lower(), name, cat))
    return out


_curie = st.sampled_from(["X:1", "X:2", "Y:1", "Z:9"])
_name = st.sampled_from(["maize", "Maize ", "rice", "wheat", "oat", ""])
_cat = st.sampled_from(["biolink:Gene", "biolink:Publication"])
_syn = st.one_of(st.none(), st.sampled_from(
    ["corn|zea", "corn", "", "rye|", "the"]))
_mention = st.sampled_from(["maize", "MAIZE", " rice ", "ricee", "wheat",
                            "qqqqqq", "the", "oats", "ry", "corn"])


@settings(max_examples=12, **_S)
@given(st.lists(st.tuples(_curie, _name, _cat, _syn),
                min_size=1, max_size=8),
       st.lists(_mention, min_size=1, max_size=10))
def test_link_mentions_nl_matches_python_reference(spark, aliases, mentions):
    from ecokg_spark.operators.linking import (build_termlist,
                                               link_ambiguity, link_mentions)

    adf = spark.createDataFrame(
        aliases, "curie string, name string, category string, synonym string")
    termlist = build_termlist(adf)
    tl = _termlist_py(aliases)
    got_tl = {tuple(r) for r in termlist.collect()}
    assert got_tl == set(tl)

    mdf = spark.createDataFrame([(i, m) for i, m in enumerate(mentions)],
                                "mid long, mention string")
    linked, quarantine = link_mentions(mdf, termlist,
                                       fuzzy_strategy="nl")
    got_linked = {(r["mid"], r["curie"], r["match_kind"])
                  for r in linked.collect()}
    got_q = {r["mid"] for r in quarantine.collect()}

    dim = {}
    for curie, _, norm, _, _ in tl:
        if norm not in dim or curie < dim[norm]:
            dim[norm] = curie
    exp_linked, exp_q = set(), set()
    for i, m in enumerate(mentions):
        norm = m.strip().lower()
        if norm in _STOP:
            continue  # stopword mentions vanish from both outputs
        if norm in dim:
            exp_linked.add((i, dim[norm], "exact"))
            continue
        cands = [( _lev(norm, t), c, t) for t, c in dim.items()
                 if _lev(norm, t) <= 2]
        if cands:
            exp_linked.add((i, min(cands)[1], "fuzzy"))
        else:
            exp_q.add(i)
    assert got_linked == exp_linked
    assert got_q == exp_q

    got_amb = {r["mention"]: (r["min_dist"], r["n_candidates"])
               for r in link_ambiguity(mdf, termlist).collect()}
    exp_amb = {}
    for m in {m.strip().lower() for m in mentions}:
        ds = [(_lev(m, t), c) for t, c in dim.items() if _lev(m, t) <= 2]
        if ds:
            mind = min(d for d, _ in ds)
            exp_amb[m] = (mind, len({c for d, c in ds if d == mind}))
    assert got_amb == exp_amb
