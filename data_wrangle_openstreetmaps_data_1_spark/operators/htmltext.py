"""HTML main-content extraction (the CCNet / trafilatura-style stage).

Real web-scale curation starts from raw HTML: strip non-content machinery
(``<script>``/``<style>``), drop boilerplate blocks (nav, footers,
subscribe banners), flatten the remaining markup, and keep link metrics
for downstream quality gates (high link density ⇒ navigation/listing
pages, a standard boilerplate signal).

The container has no HTML corpus and no parser library, so — like the
multimodal tier (operators/multimodal.py) — the DOCUMENT BODIES are
deterministic fakes: each ``documents.text`` row is wrapped in a fixed
page template (title/style/script head, nav, an every-third-doc subscribe
banner, footer). What is REAL and tested is the extraction pipeline
itself: the regex cascade, its cross-engine semantics (Java regex vs
DuckDB's RE2 — patterns below avoid backreferences and lookaround, which
RE2 lacks), and the round-trip property that extraction recovers exactly
the original text from the wrapped page.

Everything is built from the SHARED constants below — the Spark column
expression and the DuckDB oracle SQL are generated from one source of
truth, so the two engines can never drift pattern-by-pattern.

Scale: a per-row regex cascade over the raw page column — map-only,
whole-stage-codegen'd, no shuffle, no Python. At 100 TB this runs at scan
speed; the one real-world caveat (regex cost on multi-MB pages) is
bounded the same way production pipelines do it: truncate pages at a size
cap upstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# page template pieces (synthesis)
_HEAD = (
    "<html><head><title>%TITLE%</title><style>p{margin:0}</style>"
    "<script>track();</script></head><body>"
)
_NAV = '<nav><a href="/">home</a> <a href="/tags">tags</a></nav>'
_BANNER = '<div class="banner"><a href="/subscribe">subscribe now</a></div>'
_FOOT = '<footer><a href="/tos">terms</a> (c) example</footer></body></html>'

#: ordered extraction cascade: (pattern, replacement). No backreferences,
#: no lookaround — the RE2 subset, identical semantics under Java regex.
STRIP_PATTERNS: list[tuple[str, str]] = [
    ("(?s)<script[^>]*>.*?</script>", " "),
    ("(?s)<style[^>]*>.*?</style>", " "),
    ("(?s)<nav>.*?</nav>", " "),
    ("(?s)<footer>.*?</footer>", " "),
    ('(?s)<div class="banner">.*?</div>', " "),
    ("(?s)<title>.*?</title>", " "),
    ("<[^>]+>", " "),  # flatten remaining tags
]
LINK_PATTERN = "<a href"
_WS = "\\s+"


def synth_page(text: Column, title: Column, doc_id: Column) -> Column:
    """Deterministic fake page: template + per-doc banner variation."""
    head = _HEAD.split("%TITLE%")
    return F.concat(
        F.lit(head[0]),
        title,
        F.lit(head[1]),
        F.lit(_NAV),
        F.when(doc_id % 3 == 0, F.lit(_BANNER)).otherwise(F.lit("")),
        F.lit("<p>"),
        text,
        F.lit("</p>"),
        F.lit(_FOOT),
    )


def synth_page_sql(text: str, title: str, doc_id: str) -> str:
    head = _HEAD.split("%TITLE%")
    return (
        f"'{head[0]}' || {title} || '{head[1]}' || '{_NAV}' || "
        f"CASE WHEN {doc_id} % 3 = 0 THEN '{_BANNER}' ELSE '' END || "
        f"'<p>' || {text} || '</p>' || '{_FOOT}'"
    )


def extract_main_text(page: Column) -> Column:
    """Apply the strip cascade, collapse whitespace, trim."""
    out = page
    for pat, rep in STRIP_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(F.regexp_replace(out, _WS, " "))


def extract_main_text_sql(page: str) -> str:
    out = page
    for pat, rep in STRIP_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return f"trim(regexp_replace({out}, '{_WS}', ' ', 'g'))"


def link_count(page: Column) -> Column:
    return F.regexp_count(page, F.lit(LINK_PATTERN))


def link_count_sql(page: str) -> str:
    return f"CAST(len(regexp_extract_all({page}, '{LINK_PATTERN}')) AS BIGINT)"
