"""Property-based reshape tests (SURVEY §5.2 — an upgrade the reference
lacks): arbitrary tag soups through shape_elements must preserve every
well-formed key, drop exactly the malformed addr subkeys, and keep the
output schema stable."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_1_spark.functions.cleaning import (
    LOWER_COLON_RE,
    PROBLEMCHARS_RE,
)
from data_wrangle_openstreetmaps_data_1_spark.operators.reshape import (
    ADDRESS_FIELDS,
    PROMOTED_TAGS,
    shape_elements,
)

_spark = None

key_strategy = st.one_of(
    st.sampled_from(
        [
            "amenity",
            "name",
            "place",
            "highway",
            "addr:street",
            "addr:housenumber",
            "addr:postcode",
            "addr:street:type",
            "addr:bad key",
            "tiger:cfcc",
            "NAME_1",
            "a b",
        ]
    ),
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=127),
        min_size=1,
        max_size=8,
    ),
)
value_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=0, max_size=12
)


def expected_shape(tags: dict[str, str]) -> tuple[dict[str, str], dict[str, str]]:
    """Independent (pure-Python) model of the reference's shape semantics."""
    address: dict[str, str] = {}
    tail: dict[str, str] = {}
    for k, v in tags.items():
        if k.startswith("addr:"):
            sub = k[5:]
            if re.search(PROBLEMCHARS_RE, sub) or re.fullmatch(LOWER_COLON_RE.strip("^$"), sub):
                continue  # dropped (data.py:159-162)
            if sub in ADDRESS_FIELDS and sub != "street":
                address[sub] = v
            elif sub == "street":
                address[sub] = v  # fix_streets=False below
        else:
            tail[k] = v
    return address, tail


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(tags=st.dictionaries(key_strategy, value_strategy, max_size=8))
def test_reshape_preserves_wellformed_keys(spark, tags):
    global _spark
    _spark = spark
    raw = spark.createDataFrame(
        [
            (
                "1",
                "47.0",
                "-117.0",
                "u",
                "9",
                "1",
                "c",
                "t",
                [(k, v) for k, v in tags.items()] or None,
            )
        ],
        "_id string, _lat string, _lon string, _user string, _uid string, "
        "_version string, _changeset string, _timestamp string, "
        "tag array<struct<_k:string,_v:string>>",
    )
    out = shape_elements(raw, "node", fix_streets=False)
    row = out.collect()[0]

    exp_address, exp_tail = expected_shape(tags)

    got_address = {k: v for k, v in row["address"].asDict().items() if v is not None}
    assert got_address == {k: v for k, v in exp_address.items() if k in ADDRESS_FIELDS}

    got_tail = dict(row["tags"] or {})
    for t in PROMOTED_TAGS:
        if row[t] is not None:
            got_tail[t] = row[t]
    assert got_tail == exp_tail

    # schema stability: same columns regardless of tag soup
    assert out.columns == [
        "id",
        "type",
        "visible",
        "lat",
        "lon",
        "created",
        "address",
        "node_refs",
        *PROMOTED_TAGS,
        "tags",
    ]
