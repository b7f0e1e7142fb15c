"""Thirteenth batch of independent pure-Python cross-checks: the as-of
join (both directions, tolerance, tiebreak dedup, atomic payload fill),
URL canonicalization + SURT keys, and PII redaction/counting."""

import datetime
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---------------------------------------------------------------------------
# asof_join — backward/forward, inclusive, tolerance, max-tiebreak dedup
# ---------------------------------------------------------------------------

_t0 = datetime.datetime(2024, 1, 1)


def _ts(s):
    return _t0 + datetime.timedelta(seconds=s)


@settings(max_examples=10, **_S)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 60)),
                min_size=1, max_size=12),
       st.lists(st.tuples(st.integers(0, 1), st.integers(0, 60),
                          st.integers(0, 9),
                          st.one_of(st.none(), st.integers(0, 5))),
                min_size=1, max_size=12),
       st.sampled_from(["backward", "forward"]),
       st.one_of(st.none(), st.integers(1, 20)))
def test_asof_join_matches_python_reference(spark, lrows, rrows, direction,
                                            tol):
    from ecokg_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame([(f"k{k}", _ts(s)) for k, s in lrows],
                                "key string, ts timestamp")
    rdf = spark.createDataFrame(
        [(f"k{k}", _ts(s), v, b) for k, s, v, b in rrows],
        "key string, ts timestamp, v int, b int")
    out = asof_join(ldf, rdf, on=["key"], direction=direction,
                    tolerance_s=float(tol) if tol is not None else None,
                    tiebreak="v")
    got = Counter((r["key"], r["ts"], r["_asof_ts"], r["v"], r["b"])
                  for r in out.collect())

    # dedup right: max v per (key, ts) — row_number over v desc
    best: dict[tuple, tuple] = {}
    for k, s, v, b in rrows:
        cur = best.get((k, s))
        if cur is None or v > cur[0]:
            best[(k, s)] = (v, b)
    exp = Counter()
    for k, ls in lrows:
        if direction == "backward":
            cands = [s for (kk, s) in best if kk == k and s <= ls]
            rs = max(cands) if cands else None
        else:
            cands = [s for (kk, s) in best if kk == k and s >= ls]
            rs = min(cands) if cands else None
        if rs is not None and tol is not None and abs(ls - rs) > tol:
            rs = None
        if rs is None:
            exp[(f"k{k}", _ts(ls), None, None, None)] += 1
        else:
            v, b = best[(k, rs)]
            exp[(f"k{k}", _ts(ls), _ts(rs), v, b)] += 1
    assert got == exp


# ---------------------------------------------------------------------------
# url_canonicalize / url_surt — spec replays over adversarial URLs
# ---------------------------------------------------------------------------

def _extract(pattern, s):
    m = re.search(pattern, s)
    return m.group(1) if m and m.group(1) is not None else ""

_RE_SCHEME = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_RE_HOST = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_RE_HOSTPORT = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)"
_RE_PATH = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_RE_QUERY = r"\?([^#]*)"


def _canon_py(u):
    scheme = _extract(_RE_SCHEME, u).lower()
    if scheme == "":
        return u
    hostport = _extract(_RE_HOSTPORT, u).lower()
    if scheme == "http":
        hostport = re.sub(":80$", "", hostport)
    if scheme == "https":
        hostport = re.sub(":443$", "", hostport)
    path = _extract(_RE_PATH, u)
    if path == "/":
        path = ""
    q = "&".join(p for p in _extract(_RE_QUERY, u).split("&")
                 if p != "" and not p.startswith("utm_"))
    return f"{scheme}://{hostport}{path}" + (f"?{q}" if q else "")


def _surt_py(u):
    host = _extract(_RE_HOST, u).lower()
    host = re.sub(r"^www\.", "", host)
    if host == "":
        return ""
    rev = ",".join(reversed(host.split(".")))
    path = _extract(_RE_PATH, u).lower()
    if path == "":
        path = "/"
    return f"{rev}){path}"


_URLS = st.sampled_from([
    "http://WWW.Example.COM:80/A/b?utm_x=1&q=2#frag",
    "https://u:p@Host.co.uk:443/",
    "https://News.Example.co.uk/a/b?x=1",
    "http://a.b.c/?utm_source=x&utm_medium=y",
    "http://h8080.com:8080/p", "http://h/", "http://h",
    "notaurl", "", "ftp://Host.com/Path?A=B#c",
    "http://x.com/a?&&q=1", "HTTPS://UP.example.com/Q",
])


@settings(max_examples=10, **_S)
@given(st.lists(_URLS, min_size=1, max_size=12))
def test_url_canonicalize_and_surt_match_python(spark, urls):
    from ecokg_spark.functions.url import url_canonicalize, url_surt

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        "url",
        url_canonicalize("url").alias("canon"),
        url_surt("url").alias("surt"),
    ).collect()
    for r in got:
        assert r["canon"] == _canon_py(r["url"]), r["url"]
        assert r["surt"] == _surt_py(r["url"]), r["url"]


# ---------------------------------------------------------------------------
# PII redaction — progressive regexp_replace chain + counts
# ---------------------------------------------------------------------------

_RE_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_RE_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_RE_PHONE = (
    "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{2,4}\\)?[-. ][0-9]{3,4}[-. ][0-9]{3,4}"
    "|\\+[0-9]{9,14}"
)

_PII_PIECE = st.sampled_from([
    "contact me at bob.smith+x@mail.example.org today",
    "server 192.168.0.1 and 10.0.0.255:8080",
    "call +1 (555) 123-4567 or 555 123 4567",
    "+4915123456789 is my number", "v1.2.3.4 release",
    "a@b.co", "not@anemail@", "plain text", "1.2.3.4.5",
    "(020) 7946 0958",
])


@settings(max_examples=12, **_S)
@given(st.lists(_PII_PIECE, min_size=1, max_size=6))
def test_pii_redaction_matches_python_reference(spark, pieces):
    from ecokg_spark.functions.pii import pii_counts, redact_pii

    text = " | ".join(pieces)
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(redact_pii("text").alias("red"),
                    *pii_counts("text")).collect()[0]
    after_email = re.sub(_RE_EMAIL, "[EMAIL]", text)
    after_ip = re.sub(_RE_IPV4, "[IP]", after_email)
    red = re.sub(_RE_PHONE, "[PHONE]", after_ip)
    assert row["red"] == red
    assert row["n_emails"] == len(re.findall(_RE_EMAIL, text))
    assert row["n_ips"] == len(re.findall(_RE_IPV4, after_email))
    assert row["n_phones"] == len(re.findall(_RE_PHONE, after_ip))
