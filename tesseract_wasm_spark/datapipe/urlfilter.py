"""URL-level corpus filtering — the stage every crawl pipeline runs BEFORE
fetching or extracting a byte of payload (C4 drops by bad-words domain
lists, RefinedWeb by URL scoring; both drop media extensions and IP hosts).
At 10^12 documents this filter is the cheapest leverage in the pipeline:
it prunes rows using ONLY the url column, so predicate pushdown keeps the
payload bytes unread for every dropped row (see PLANS.md §1 — at crawl
scale the payload column IS the table).

Everything is whole-stage-codegen expressions over RE2-safe regexes; the
DuckDB oracle twin (queries.SQL_URL_FILTERS) interpolates the IDENTICAL
pattern constants, so the two derivations cannot drift.

Reference: tesseract-wasm has no source/corpus tier (it consumes in-memory
bitmaps — src/ocr-engine.ts:171-210); this module is brief-scope
(training-data pipeline), not reference-parity scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: scheme://authority parse (RE2-safe, shared verbatim with the SQL twin).
#: authority may carry :port; host strips it.
RE_AUTHORITY = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
RE_HOST = r"^([^:]+)"
RE_PORT = r":(\d+)$"
RE_PATH = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+(/[^?#]*)"
RE_TLD = r"\.([a-z0-9\-]+)$"
RE_IP_HOST = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"
#: media/asset extensions a TEXT pipeline never wants (pdf deliberately NOT
#: here — this engine extracts PDFs; images route to the OCR tier when they
#: arrive as payloads, but an asset URL itself is skippable)
RE_BAD_EXT = (
    r"\.(?:jpg|jpeg|png|gif|webp|ico|svg|css|js|woff|woff2|ttf|mp3|mp4|avi"
    r"|mov|zip|gz|tar|rar|exe|dmg|iso)$"
)

#: default domain blocklist (suffix match on the registrable tail) — the
#: shape of a C4-style bad-domain list; real deployments pass their own
DEFAULT_BLOCKLIST: tuple[str, ...] = (
    "ads.example", "tracker.example", "spam.example",
)

#: more path segments than this is almost never a content page (calendar
#: traps, faceted-search explosions — the classic crawler tarpits)
MAX_PATH_DEPTH = 8


def url_quality_cols(url: Column,
                     blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
                     max_path_depth: int = MAX_PATH_DEPTH) -> dict[str, Column]:
    """Expression bundle for URL screening (composable like the textstats
    *_cols helpers): host/tld/port/path features + per-rule flags + the
    combined keep verdict.

    Scale shape: pure codegen over the url column only — as a pre-extraction
    filter it composes into the scan's pushed predicates, so dropped rows
    never materialize their payload bytes. ``blocklist`` is compiled into
    the expression (fine to a few hundred entries; a production million-
    entry list becomes a broadcast anti-join on the registrable suffix
    instead — same verdict column, different plan)."""
    authority = F.lower(F.regexp_extract(url, RE_AUTHORITY, 1))
    host = F.regexp_extract(authority, RE_HOST, 1)
    port = F.regexp_extract(authority, RE_PORT, 1)
    path = F.regexp_extract(url, RE_PATH, 1)
    tld = F.regexp_extract(host, RE_TLD, 1)
    path_depth = (
        F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))
    ).cast("int")
    is_ip = host.rlike(RE_IP_HOST)
    bad_ext = F.lower(path).rlike(RE_BAD_EXT)
    blocked = F.lit(False)
    for dom in blocklist:
        blocked = blocked | (host == dom) | host.endswith("." + dom)
    has_port = port != ""
    too_deep = path_depth > max_path_depth
    keep = ~(blocked | is_ip | bad_ext | too_deep)
    return {
        "host": host, "tld": tld, "path_depth": path_depth,
        "is_ip_host": is_ip, "bad_ext": bad_ext, "blocked_domain": blocked,
        "has_port": has_port, "too_deep": too_deep, "keep": keep,
    }


def url_quality(docs: DataFrame, *, url_col: str = "url",
                id_col: str = "doc_id",
                blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
                max_path_depth: int = MAX_PATH_DEPTH) -> DataFrame:
    """One screening row per document: URL features, per-rule flags, and the
    keep verdict — the pre-extraction gate of the corpus pipeline."""
    cols = url_quality_cols(F.col(url_col), blocklist, max_path_depth)
    return docs.select(
        id_col, F.col(url_col).alias("url"),
        *[c.alias(n) for n, c in cols.items()],
    )
