"""robots.txt politeness gate — the crawl-pipeline stage that decides, per
(host, path), whether a corpus may keep a page at all (C4 and every polite
crawler honor it). Semantics follow RFC 9309 (the Robots Exclusion
Protocol, public spec):

- group selection: the group whose User-agent product token most
  specifically matches the crawler wins (exact token beats ``*``); ONLY
  that group's rules apply (groups are not merged);
- rule matching: longest-match wins over all Allow/Disallow patterns of
  the selected group; on a specificity tie, Allow wins;
- patterns are path prefixes, with ``*`` wildcards and a ``$`` end anchor;
- no matching rule (or no robots.txt) -> allowed.

Scale shape: robots files are one tiny blob per HOST (~10^7 hosts for a
full crawl vs 10^12 pages), so rules parse once per host into a skinny
(host, pattern, allow, specificity) table that BROADCASTS to the pages
join; the per-page work is pure codegen (startswith / regexp_like +
one map-side-combinable argmax per url). The payload column is never
touched — like urlfilter, this gate runs before any byte of html is read.

Reference: tesseract-wasm has no crawl tier (brief-scope op, not
reference-parity scope).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from tesseract_wasm_spark.datapipe.urlfilter import RE_AUTHORITY, RE_HOST, RE_PATH

#: this engine's product token (what a deployment would put in its UA)
DEFAULT_AGENT = "twsparkbot"

_LINE_RE = re.compile(r"^\s*(user-agent|allow|disallow)\s*:\s*(.*?)\s*$",
                      re.I | re.M)


def parse_robots(content: str, agent: str = DEFAULT_AGENT) -> list[tuple[str, bool, int]]:
    """robots.txt text -> the SELECTED group's rules as
    (pattern, allow, specificity) triples. Group selection per RFC 9309:
    exact product-token match beats ``*``; consecutive User-agent lines
    share one group; comments (#) stripped. Specificity = pattern length
    with wildcards excluded (the Google-documented tie metric)."""
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    in_group_header = True
    for m in _LINE_RE.finditer(re.sub(r"#[^\n]*", "", content)):
        field, value = m.group(1).lower(), m.group(2)
        if field == "user-agent":
            if not in_group_header:  # a new group starts
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(value.lower())
            in_group_header = True
        else:
            if value:  # empty Allow/Disallow is a no-op per the RFC
                rules.append((value, field == "allow"))
            in_group_header = False
    if agents:
        groups.append((agents, rules))
    agent = agent.lower()
    exact = [g for g in groups if agent in g[0]]
    wild = [g for g in groups if "*" in g[0]]
    chosen = exact[0] if exact else (wild[0] if wild else None)
    if chosen is None:
        return []
    return [
        (pat, allow, len(pat.replace("*", "")))
        for pat, allow in chosen[1]
    ]


def _pattern_regex(pat: str) -> str:
    """Robots pattern -> RE2-safe anchored regex: literal chars escaped,
    ``*`` -> ``.*``, trailing ``$`` -> end anchor; matches from the path
    START (prefix semantics)."""
    anchored = pat.endswith("$")
    if anchored:
        pat = pat[:-1]
    body = ".*".join(re.escape(part) for part in pat.split("*"))
    return "^" + body + ("$" if anchored else "")


def allowed(path: str, rules: list[tuple[str, bool, int]]) -> bool:
    """Longest-match evaluation of one path against a parsed rule list;
    specificity tie -> Allow wins; no match -> allowed."""
    best: tuple[int, bool] | None = None
    for pat, allow, spec in rules:
        if re.match(_pattern_regex(pat), path):
            key = (spec, allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def robots_rules(robots: DataFrame, *, host_col: str = "host",
                 content_col: str = "robots_txt",
                 agent: str = DEFAULT_AGENT) -> DataFrame:
    """(host, robots.txt text) -> exploded per-rule rows
    (host, pattern, rule_regex, allow, specificity) for the agent's
    selected group — the skinny broadcast side of the gate."""
    import pandas as pd  # noqa: PLC0415

    def run(batches):
        for pdf in batches:
            out = []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                for pat, allow, spec in parse_robots(str(content), agent):
                    out.append({
                        "host": host, "pattern": pat,
                        "rule_regex": _pattern_regex(pat),
                        "allow": allow, "specificity": spec,
                    })
            yield pd.DataFrame(
                out, columns=["host", "pattern", "rule_regex", "allow",
                              "specificity"],
            )

    return robots.select(host_col, content_col).mapInPandas(
        run, schema="host string, pattern string, rule_regex string, "
                    "allow boolean, specificity int",
    )


def _url_host_path(url: Column) -> tuple[Column, Column]:
    authority = F.lower(F.regexp_extract(url, RE_AUTHORITY, 1))
    host = F.regexp_extract(authority, RE_HOST, 1)
    path = F.coalesce(F.regexp_extract(url, RE_PATH, 1), F.lit(""))
    return host, F.when(path == "", "/").otherwise(path)


def robots_gate(pages: DataFrame, rules: DataFrame, *,
                url_col: str = "url") -> DataFrame:
    """pages + an ``allowed`` verdict per url: broadcast the per-host rule
    table, evaluate every rule of the url's host in codegen
    (regexp_like against the precompiled anchored regex), and pick the
    longest match with Allow winning ties — one map-side-combinable
    max(struct(specificity, allow)) per url, default allowed when no rule
    (or no robots.txt for the host) matches."""
    host, path = _url_host_path(F.col(url_col))
    keyed = pages.withColumn("_host", host).withColumn("_path", path)
    joined = keyed.join(F.broadcast(rules), keyed["_host"] == rules["host"],
                        "left")
    matched = F.when(
        F.col("rule_regex").isNotNull()
        & F.regexp_like(F.col("_path"), F.col("rule_regex")),
        F.struct(F.col("specificity").alias("s"), F.col("allow").alias("a")),
    )
    best = joined.groupBy(url_col).agg(F.max(matched).alias("_b"))
    return (
        keyed.join(best, url_col)
        .select(
            *[F.col(c) for c in pages.columns],
            F.coalesce(F.col("_b.a"), F.lit(True)).alias("allowed"),
        )
    )
