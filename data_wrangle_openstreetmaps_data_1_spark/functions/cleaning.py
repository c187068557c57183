"""Cleaning column-expression library (SURVEY.md §2.8 F1-F12, §2.10 W1-W8).

Every transform here is a pure Catalyst column expression — no Python UDFs —
so the whole cleaning pass stays inside whole-stage codegen and runs
vectorized on executors. The reference performed these as per-document
MongoDB update round-trips (reference readme.md:43-103, self-described as
"quite slow" at readme.md:374); here each is a single distributed ``select``.

Semantics ported from:
- street normalize: reference ProjectCodeUsed/data.py:98-118 (``mapping`` +
  ``update_name`` — replace only the LAST whitespace token)
- key classification: reference Lesson6Quizes/tags.py:21-46 (``lower``,
  ``lower_colon``, ``problemchars`` regex classes)
- postcode/state/city repairs: reference readme.md:43-103 (W1-W7)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- regex constants (reference ProjectCodeUsed/data.py:92-96, Java-regex form)
LOWER_RE = r"^([a-z]|_)*$"
LOWER_COLON_RE = r"^([a-z]|_)*:([a-z]|_)*$"
# Java regex: inside a character class, escape what needs escaping.
PROBLEMCHARS_RE = r"""[=+/&<>;'"?%#$@,. \t\r\n]"""

# Last whitespace-delimited token, optionally dot-terminated
# (reference Lesson6Quizes/audit.py:18 ``street_type_re``).
STREET_TYPE_RE = r"\b\S+\.?$"

# Street-suffix repair mapping (reference ProjectCodeUsed/data.py:73-84):
# suffix abbreviations plus whole-name one-offs (bare "Arthur" etc.).
STREET_MAPPING: dict[str, str] = {
    "St": "Street",
    "St.": "Street",
    "Rd": "Road",
    "Rd.": "Road",
    "Ave": "Avenue",
    "Blvd": "Boulevard",
    "Blvd.": "Boulevard",
    "Arthur": "Arthur St",
    "Wellesley": "Wellesley Avenue",
    "Main": "Main Avenue",
}

# Street types considered already-clean (reference Lesson6Quizes/audit.py:22-23).
EXPECTED_STREET_TYPES = [
    "Street",
    "Avenue",
    "Boulevard",
    "Drive",
    "Court",
    "Place",
    "Square",
    "Lane",
    "Road",
    "Trail",
    "Parkway",
    "Commons",
]

# Merged-postcode pattern (reference readme.md:43-46):
# optional city word, 2-letter state, 5-digit zip — e.g. "Spokane, WA 99218".
MERGED_POSTCODE_RE = r"(\w+)?,? ?([A-Z][A-Z]) (\d{5})"

# Merged-city pattern (reference readme.md:94-96): "Otis Orchards, WA".
MERGED_CITY_RE = r"([\W\w]+), (\w+)"


def _street_map_expr() -> Column:
    pairs: list[Column] = []
    for k, v in STREET_MAPPING.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def normalize_street(col: Column) -> Column:
    """F1: replace the last whitespace token via ``STREET_MAPPING``.

    Faithful to reference ``update_name`` (ProjectCodeUsed/data.py:110-118):
    only the *last* ``str.split()`` token is eligible, so "Main Street" stays
    unchanged even though bare "Main" maps to "Main Avenue".
    """
    parts = F.split(F.trim(col), r"\s+")
    n = F.size(parts)
    last = F.element_at(parts, -1)
    mapped = F.coalesce(F.element_at(_street_map_expr(), last), last)
    head = F.slice(parts, 1, n - 1)
    fixed = F.concat_ws(" ", F.concat(head, F.array(mapped)))
    # Preserve NULL (absent field) semantics.
    return F.when(col.isNull(), col).otherwise(fixed)


def street_type(col: Column) -> Column:
    """F3: extract the street-type suffix (last token, audit.py:18)."""
    return F.regexp_extract(col, STREET_TYPE_RE, 0)


def classify_key(col: Column) -> Column:
    """P7: classify a tag key into the reference's four character classes
    (Lesson6Quizes/tags.py:21-46). Order matters: problemchars wins over
    lower/lower_colon only if neither fully matches first — the reference
    checks lower, then lower_colon, then problemchars, else 'other'."""
    return (
        F.when(col.rlike(LOWER_RE), F.lit("lower"))
        .when(col.rlike(LOWER_COLON_RE), F.lit("lower_colon"))
        .when(col.rlike(PROBLEMCHARS_RE), F.lit("problemchars"))
        .otherwise(F.lit("other"))
    )


def clean_postcode(postcode: Column, tiger_zip: Column | None = None) -> Column:
    """W1/W2/W3 postcode value repair (reference readme.md:43-67).

    - merged "City, ST 99999" forms -> extract the 5-digit zip (W1)
    - bare state code ("WA") -> NULL here; see :func:`state_from_postcode` (W2)
    - TIGER range ids ("189872421:189872425") -> sidecar ``tiger:zip_right``
      lookup when available (W3, generalized from the hardcoded update)
    - zip+4 ("99218-1929") intentionally KEPT (reference readme.md:67)
    """
    merged_zip = F.regexp_extract(postcode, MERGED_POSTCODE_RE, 3)
    out = (
        F.when(postcode.rlike(r"^[A-Z][A-Z]$"), F.lit(None).cast("string"))
        .when(postcode.rlike(MERGED_POSTCODE_RE), merged_zip)
        .when(
            postcode.rlike(r"^\d+:\d+$"),
            tiger_zip if tiger_zip is not None else F.lit(None).cast("string"),
        )
        .otherwise(postcode)
    )
    return out


def state_from_postcode(postcode: Column, state: Column) -> Column:
    """W1/W2: when the postcode field held a state ("WA") or a merged
    "City, ST zip" string, move the state code into ``state`` (readme.md:47-58)."""
    merged_state = F.regexp_extract(postcode, MERGED_POSTCODE_RE, 2)
    return (
        F.when(postcode.rlike(r"^[A-Z][A-Z]$"), postcode)
        .when(postcode.rlike(MERGED_POSTCODE_RE) & (merged_state != ""), merged_state)
        .otherwise(state)
    )


def city_from_postcode(postcode: Column, city: Column) -> Column:
    """W1: the merged "City, ST zip" postcode also donates its city part —
    but only when the optional city group matched (readme.md:49-51
    ``if mdict['city']``)."""
    part = F.regexp_extract(postcode, MERGED_POSTCODE_RE, 1)
    return F.when(postcode.rlike(MERGED_POSTCODE_RE) & (part != ""), part).otherwise(city)


def clean_state(state: Column) -> Column:
    """W4: lowercase state codes upper-cased ('wa' -> 'WA', readme.md:78-80),
    long names mapped ('Washington' -> 'WA', readme.md:99-101)."""
    return (
        F.when(state.rlike(r"^[a-z]{2}$"), F.upper(state))
        .when(state == "Washington", F.lit("WA"))
        .when(state == "Idaho", F.lit("ID"))
        .otherwise(state)
    )


def clean_city(city: Column) -> Column:
    """W5/W6/W7 city repairs (reference readme.md:83-103):
    - all-lowercase -> initcap ('spokane' -> 'Spokane')
    - any Coeur d?Alene misspelling -> "Coeur d'Alene"
    - merged "City, ST" -> keep the city part
    """
    split_city = F.regexp_extract(city, MERGED_CITY_RE, 1)
    fixed = (
        F.when(city.rlike(r"^[a-z ]+$"), F.initcap(city))
        .when(city.rlike(MERGED_CITY_RE), split_city)
        .otherwise(city)
    )
    return F.regexp_replace(fixed, r"Coeur d[^']Alene", "Coeur d'Alene")


def state_from_city(city: Column, state: Column) -> Column:
    """W7: merged "City, ST" strings donate their state part ONLY for the
    reference's recognized values — WA, ID, or Washington -> WA
    (readme.md:98-101); any other suffix leaves state untouched even though
    the city still splits."""
    part = F.regexp_extract(city, MERGED_CITY_RE, 2)
    return (
        F.when(city.rlike(MERGED_CITY_RE) & part.isin("WA", "ID"), part)
        .when(city.rlike(MERGED_CITY_RE) & (part == "Washington"), F.lit("WA"))
        .otherwise(state)
    )
