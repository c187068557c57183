"""Text-analysis column expressions for the LLM-pipeline operators
(BASELINE.json north star: dedup / quality / language-ID / token counting
over the ``documents`` table).

Everything here is built-in-function-only (JVM-side, codegen); no Python in
the hot path. Each helper has an exact ANSI-SQL twin used by the DuckDB
oracle (see plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal stopword markers per language for the n-gram/stopword heuristic.
# Chosen to be disjoint across languages; zh detected by Han codepoints.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "los", "las", "es", "y"],
}
HAN_RE = r"[一-鿿]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text. DuckDB twin:
    ``regexp_split_to_array(lower(trim(text)), '\\s+')``."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: count maximal runs of word chars, digits,
    or single punctuation — a BPE-flavored upper bound used for budgeting.
    DuckDB twin: ``len(regexp_extract_all(text, pat))``."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0)))


def word_shingles(toks: Column, n: int) -> Column:
    """n-gram word shingles from a token array: positions 1..size-n+1, each
    joined with single spaces. DuckDB twin via ``list_transform(range(...))``."""
    # Guard: F.sequence(1, 0) would generate a DESCENDING [1, 0] sequence,
    # so short docs must return an empty array explicitly.
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def char_count(col: Column, pattern: str) -> Column:
    """Count regex matches in a string (portable: both engines have
    regexp_extract_all / length semantics)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def punct_ratio(col: Column) -> Column:
    return char_count(col, r"[^\w\s]") / F.greatest(F.length(col), F.lit(1))


def digit_ratio(col: Column) -> Column:
    return char_count(col, r"[0-9]") / F.greatest(F.length(col), F.lit(1))


def avg_token_len(col: Column) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return total / F.greatest(F.size(t), F.lit(1))


def stopword_hits(col: Column, markers: list[str]) -> Column:
    """How many tokens are in the marker list (language evidence count)."""
    t = tokens(col)
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(t, lambda x: F.array_contains(marker_arr, x)))


def predict_lang(col: Column) -> Column:
    """Deterministic stopword/charset language-ID heuristic:
    Han chars => zh; else the language with the most marker hits (ties broken
    by fixed priority en > fr > de > es); no hits => 'und'."""
    hits = {lang: stopword_hits(col, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    pred = (
        F.when(char_count(col, HAN_RE) > 0, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["fr"] == best, F.lit("fr"))
        .when(hits["de"] == best, F.lit("de"))
        .otherwise(F.lit("es"))
    )
    return pred


# The quality composite's SQL twin, single source of truth shared by every
# oracle that scores quality (tx_quality, tx_weighted_sample). Callers
# interpolate the three sub-expressions for their own CTE context.
QUALITY_SQL_TEMPLATE = (
    "CAST(50"
    " + (CASE WHEN {n_toks} BETWEEN 20 AND 1000 THEN 25 ELSE 0 END)"
    " + (CASE WHEN {punct} < 0.1 THEN 15 ELSE 0 END)"
    " + (CASE WHEN {atl} >= 3 AND {atl} <= 10 THEN 10 ELSE 0 END)"
    " AS INT)"
)


def quality_score(col: Column) -> Column:
    """Composite 0-100 quality score from length / punctuation / mean token
    length, mirroring classic pretraining-data heuristics. Deterministic
    integer output so the oracle hash is exact."""
    n_tok = token_count(col)
    score = (
        F.lit(50)
        + F.when((n_tok >= 20) & (n_tok <= 1000), F.lit(25)).otherwise(F.lit(0))
        + F.when(punct_ratio(col) < 0.1, F.lit(15)).otherwise(F.lit(0))
        + F.when((avg_token_len(col) >= 3) & (avg_token_len(col) <= 10), F.lit(10)).otherwise(F.lit(0))
    )
    return score.cast("int")


# PII patterns shared verbatim with the DuckDB oracle. Written without regex
# brace quantifiers so the same literal embeds cleanly in generated SQL, and
# using only syntax Java regex and RE2 interpret identically (\b is an ASCII
# word boundary in both).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]+"
PII_PHONE_RE = r"\b555-[0-9][0-9][0-9][0-9]\b"
PII_IP_RE = r"\b[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+\b"


def scrub_pii(col: Column) -> Column:
    """Redact emails, 555-prefixed phone numbers, and dotted-quad IPs.

    Order matters and is fixed (email -> phone -> ip): the replacement
    tokens contain no digits, so later passes can't re-match earlier
    redactions. DuckDB twin: nested ``regexp_replace(..., 'g')`` (DuckDB
    replaces only the first match without the 'g' flag; Spark replaces all
    by default).
    """
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, PII_IP_RE, "<IP>")


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set — the
    classic "fingerprint method" for near-identical detection under token
    reordering. Portable (md5 identical across engines)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def canonical_url(col: Column) -> Column:
    """RFC-3986-lite URL canonicalization — the web-crawl dedup key.

    Rules (kept to syntax both Java regex and RE2 support — no lookahead,
    so the DuckDB oracle can mirror each step):
      1. lowercase scheme://host (path/query stay case-sensitive)
      2. drop the #fragment
      3. strip default ports (:80 http, :443 https)
      4. strip utm_*/gclid/fbclid tracking params, tidying ?/& leftovers
      5. strip trailing slashes
    """
    host = F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    u = F.concat(F.lower(host), F.substring(col, F.length(host) + 1, F.lit(1 << 30)))
    u = F.regexp_replace(u, r"#.*", "")
    u = F.regexp_replace(u, r"^https://([^/:?#]+):443/", r"https://$1/")
    u = F.regexp_replace(u, r"^https://([^/:?#]+):443$", r"https://$1")
    u = F.regexp_replace(u, r"^http://([^/:?#]+):80/", r"http://$1/")
    u = F.regexp_replace(u, r"^http://([^/:?#]+):80$", r"http://$1")
    # Anchored to a [?&] delimiter so a param whose name merely ENDS with a
    # tracked name (e.g. ?xgclid=1) is never mangled; the (...)+ run form
    # consumes consecutive tracked params (?utm_a=1&utm_b=2&rest=3 ->
    # ?rest=3) that a single-param anchored match would miss, because
    # regexp_replace resumes scanning after the consumed delimiter.
    u = F.regexp_replace(u, r"([?&])((?:utm_[a-z]+|gclid|fbclid)=[^&#]*&?)+", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    return F.regexp_replace(u, r"/+$", "")
