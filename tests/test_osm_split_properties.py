"""Property tests for the byte-range XML extractor (sources/osm_split.py).

The extractor is hand-rolled byte logic, so hypothesis sweeps the inputs
a planet file can actually contain — attribute values with escaped
markup, bare '>', quotes, multi-byte unicode (range boundaries may land
MID-CODEPOINT; extraction is byte-based and only complete elements are
decoded) — against every chunk size, asserting the split-invariance
contract: the union of per-range extractions equals the whole-document
extraction, each element exactly once, regardless of where the
boundaries fall. Pure-Python via extract_fragments_in_range (the same
code the Spark tasks run), so hundreds of examples cost nothing.
"""

from __future__ import annotations

from xml.sax.saxutils import quoteattr

from hypothesis import given, settings
from hypothesis import strategies as st

from data_wrangle_openstreetmaps_data_1_spark.sources.osm_split import (
    extract_fragments_in_range,
    plan_ranges,
)

# attribute text drawn from the hazards: markup chars (escaped by
# quoteattr), bare '>', both quote kinds, multi-byte unicode, whitespace
_attr_text = st.text(
    alphabet=st.sampled_from(list("ab<>&\"' \t\né 中\U0001f600")),
    min_size=0,
    max_size=12,
)


@st.composite
def _documents(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    elems = []
    for i in range(n):
        val = quoteattr(draw(_attr_text))
        self_close = draw(st.booleans())
        if self_close:
            elems.append(f'<node id="{i}" v={val}/>')
        else:
            # child tag exercises the nested-markup path (close-token scan)
            elems.append(f'<node id="{i}" v={val}><tag k="a" v={val}/></node>')
        # optional inter-element junk the scanner must skip
        if draw(st.booleans()):
            elems.append("\n  ")
    body = "".join(elems)
    return f"<osm>{body}</osm>".encode("utf-8"), n


def _extract_all(data: bytes, chunk: int, max_element_bytes: int = 1 << 16) -> list[str]:
    frags: list[str] = []
    for start, end in plan_ranges(len(data), chunk):
        buf = data[start : end + max_element_bytes]
        frags.extend(
            extract_fragments_in_range(buf, end - start, "node", start, max_element_bytes)
        )
    return frags


@settings(max_examples=200, deadline=None)
@given(doc=_documents(), chunk=st.integers(min_value=1, max_value=300))
def test_split_invariance(doc, chunk):
    data, n = doc
    whole = _extract_all(data, chunk=len(data) + 1)  # single range
    split = _extract_all(data, chunk=chunk)
    assert len(whole) == n
    assert split == whole  # same fragments, same order, exactly once


@settings(max_examples=100, deadline=None)
@given(doc=_documents())
def test_ids_complete_and_parseable(doc):
    """Every fragment is a well-formed standalone XML element carrying its
    original id and attribute value (escapes intact)."""
    import xml.etree.ElementTree as ET

    data, n = doc
    frags = _extract_all(data, chunk=17)
    ids = sorted(int(ET.fromstring(f).get("id")) for f in frags)
    assert ids == list(range(n))
