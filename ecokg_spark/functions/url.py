"""URL column expressions for web-corpus processing.

All pure Catalyst (`pyspark.sql.functions` only) so they stay inside
whole-stage codegen with the scan — no UDFs, no `java.net.URL` trivia.
Parsing is regex-based with patterns chosen to be Java-regex/RE2
compatible, so every function has an exactly-equivalent DuckDB twin in
``ecokg_spark.contract`` and the driver's oracle can recompute values
verbatim.

These extend the engine beyond the reference (which never touches URLs;
its sources are curated TSV/CSV/JSON dumps — eco_kg transform configs)
with the ops a CommonCrawl-scale text pipeline needs: host / registered-
domain extraction for per-site aggregation and blocklists, path depth as
a quality prior, and URL canonicalization (fragment + tracking-param
stripping, default-port removal) for exact URL dedup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://[userinfo@]host[:port]  — capture groups shared verbatim with
# the oracle SQL (RE2-safe: no lookaround, no backrefs)
_RE_SCHEME = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_RE_HOST = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_RE_HOSTPORT = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)"
_RE_PATH = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_RE_QUERY = "\\?([^#]*)"

# Minimal effective-second-level-suffix set (the public-suffix entries a
# registered-domain heuristic must special-case; full PSL is a data file a
# deployment would broadcast-join instead).
SECOND_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.nz",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lowercased scheme ('' when the value is not an absolute URL)."""
    return F.lower(F.regexp_extract(_c(col), _RE_SCHEME, 1))


def url_host(col: Column | str) -> Column:
    """Lowercased host: strips scheme, userinfo, port, path/query/frag."""
    return F.lower(F.regexp_extract(_c(col), _RE_HOST, 1))


def url_path(col: Column | str) -> Column:
    """Path component (no query/fragment); '' when absent."""
    return F.regexp_extract(_c(col), _RE_PATH, 1)


def url_query(col: Column | str) -> Column:
    """Raw query string without the leading '?'; '' when absent."""
    return F.regexp_extract(_c(col), _RE_QUERY, 1)


def url_path_depth(col: Column | str) -> Column:
    """Number of non-empty path segments — a cheap quality/boilerplate
    prior (deep calendar/facet URLs correlate with thin content)."""
    segs = F.split(url_path(col), "/")
    return F.size(F.filter(segs, lambda s: s != "")).cast("long")


def url_registered_domain(col: Column | str) -> Column:
    """Registered (pay-level) domain: last two host labels, or last three
    when the final two form a known second-level public suffix (co.uk
    etc., SECOND_LEVEL_SUFFIXES). Hosts with < 2 labels pass through."""
    host = url_host(col)
    labels = F.split(host, "\\.")
    n = F.size(labels)
    two = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    three = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_2l_suffix = two.isin(SECOND_LEVEL_SUFFIXES)
    return (
        F.when(n < 2, host)
        .when(is_2l_suffix & (n >= 3), three)
        .otherwise(two)
    )


def url_canonicalize(col: Column | str) -> Column:
    """Dedup key for exact URL dedup: lowercase scheme+host, drop
    userinfo, drop default ports (:80 http / :443 https), drop the
    fragment, drop utm_* tracking params, keep remaining query params in
    their original order, and strip a trailing '/' from a bare root path.
    Non-URL values canonicalize to themselves."""
    c = _c(col)
    scheme = url_scheme(c)
    hostport = F.lower(F.regexp_extract(c, _RE_HOSTPORT, 1))
    hostport = F.when(
        (scheme == "http"), F.regexp_replace(hostport, ":80$", "")
    ).otherwise(hostport)
    hostport = F.when(
        (scheme == "https"), F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    path = url_path(c)
    path = F.when(path == "/", F.lit("")).otherwise(path)
    kept = F.filter(
        F.split(url_query(c), "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    q = F.array_join(kept, "&")
    rebuilt = F.concat(
        scheme, F.lit("://"), hostport, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", c).otherwise(rebuilt)


def url_surt(col: Column | str) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the canonical
    key format of web-archive indexes (CDX / Common Crawl's cdx-index):
    host labels reversed and comma-joined, then ')' and the path, all
    lowercased, 'www.' stripped first, query dropped. Example:
    https://www.News.Example.co.uk/a/b?x=1 -> uk,co,example,news)/a/b

    Why it exists: lexicographic order on SURT keys groups a registered
    domain's entire subtree contiguously, so a range scan (or a
    range-partitioned sort at corpus scale) retrieves per-site slices
    without a shuffle — the property CDX indexes are built on. Pure
    Catalyst; non-URLs yield ''.
    """
    c = _c(col)
    host = url_host(c)
    host = F.regexp_replace(host, "^www\\.", "")
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    path = F.lower(url_path(c))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(host == "", F.lit("")).otherwise(
        F.concat(rev, F.lit(")"), path))
