"""Sixth batch: the robots politeness layer end-to-end — random synthetic
robots.txt corpora run through parse_robots + robots_allowed and compared
against an independent pure-Python replay of the documented subset of
RFC 9309 (group formation, exact-agent-shadows-*, longest-prefix,
allow-beats-disallow, duplicate input rows keep per-row verdicts)."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_S = dict(deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])


# --- Python replay of parse_robots ----------------------------------------

def _parse_py(text):
    """-> list of (agent, rule, path) for one host."""
    entries = []  # (line_no, key, val)
    for ln, raw in enumerate(text.split("\n")):
        line = re.sub(r"#.*$", "", raw).strip()
        m = re.match(r"^([A-Za-z-]+)\s*:", line)
        key = m.group(1).lower() if m else ""
        if key not in ("user-agent", "allow", "disallow"):
            continue
        mv = re.match(r"^[A-Za-z-]+\s*:\s*(.*)$", line)
        entries.append((ln, key, mv.group(1).strip()))
    out = []
    grp = 0
    prev_ua = None
    agents: dict[int, list] = {}
    rules: dict[int, list] = {}
    for _, key, val in entries:
        is_ua = key == "user-agent"
        if is_ua and not prev_ua:
            grp += 1
        if is_ua:
            agents.setdefault(grp, []).append(val.lower())
        elif val != "":
            rules.setdefault(grp, []).append((key, val))
        prev_ua = is_ua
    for g, ags in agents.items():
        for a in ags:
            for rule, path in rules.get(g, []):
                out.append((a, rule, path))
    return out


# --- Python replay of robots_allowed ---------------------------------------

def _allowed_py(url, host_rules, agent):
    """host_rules: list of (agent, rule, path) for the url's host."""
    a = agent.lower()
    pool = [r for r in host_rules if r[0] in (a, "*")]
    if any(r[0] == a for r in pool):
        pool = [r for r in pool if r[0] == a]
    path = url.split("://", 1)[1]
    path = "/" + path.split("/", 1)[1] if "/" in path else ""
    path = path.split("?")[0].split("#")[0]
    if path == "":
        path = "/"
    best = None  # (length, rule)
    for _, rule, rpath in pool:
        if path.startswith(rpath):
            cand = (len(rpath), rule)
            if best is None or (-cand[0], cand[1]) < (-best[0], best[1]):
                best = cand
    if best is None:
        return (True, None, None)
    length, rule = best
    # recover the matched path: the engine emits the winning row's path
    match_paths = sorted(p for ag, r, p in pool
                         if r == rule and len(p) == length
                         and path.startswith(p))
    return (rule != "disallow", rule, match_paths[0])


_line = st.one_of(
    st.sampled_from([
        "User-agent: *", "User-agent: EcoBot", "User-agent: ZBot",
        "user-AGENT: ecobot",
        "Disallow: /a", "Disallow: /a/b", "Disallow: /", "Disallow:",
        "Allow: /a/b", "Allow: /a", "Allow: /b",
        "Disallow: /b # inline comment", "Allow: /a/b/c",
        "# full comment", "", "Crawl-delay: 5", "garbage line",
        "Sitemap: http://x/sitemap.xml",
    ]))
_robots = st.lists(_line, min_size=0, max_size=14).map("\n".join)
_path = st.sampled_from(["", "/", "/a", "/a/b", "/a/b/c", "/b?q=1", "/c"])


@settings(max_examples=15, **_S)
@given(st.dictionaries(st.sampled_from(["h1.com", "h2.com"]), _robots,
                       min_size=1, max_size=2),
       st.lists(st.tuples(st.sampled_from(["h1.com", "h2.com", "h3.com"]),
                          _path),
                min_size=1, max_size=10),
       st.sampled_from(["ecobot", "ZBot", "randombot"]))
def test_robots_end_to_end_matches_python_replay(spark, sites, reqs, agent):
    from ecokg_spark.operators.web import parse_robots, robots_allowed

    rdf = spark.createDataFrame(list(sites.items()),
                                "host string, robots_txt string")
    rules = parse_robots(rdf)
    got_rules = {(r["host"], r["agent"], r["rule"], r["path"])
                 for r in rules.collect()}
    exp_rules = {(h, a, rule, p)
                 for h, txt in sites.items()
                 for a, rule, p in _parse_py(txt)}
    assert got_rules == exp_rules

    urls = [f"http://{h}{p}" for h, p in reqs]
    udf = spark.createDataFrame([(u,) for u in urls], "url string")
    out = robots_allowed(udf, rules, agent=agent).collect()
    # duplicate input rows each keep their verdict (ADVICE r4 fix)
    assert len(out) == len(urls)
    got = sorted((r["url"], r["allowed"], r["matched_rule"],
                  r["matched_path"]) for r in out)
    by_host = {h: _parse_py(txt) for h, txt in sites.items()}
    exp = sorted(
        (u,) + _allowed_py(u, by_host.get(h, []), agent)
        for u, (h, _) in zip(urls, reqs))
    assert got == exp
