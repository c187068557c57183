"""Splittable scan for a SINGLE huge XML document (S1 at planet scale).

Spark 4's built-in XML source is NOT splittable: one file = one task,
whatever ``maxPartitionBytes`` says (measured in BENCH_sf1_local.json
``r11_osm_scale``: a 468 MB document scanned as 1 partition). For many
small files that's fine — but the reference's domain ships planet-scale
datasets as ONE multi-GB XML document, where an unsplittable scan
serializes the entire ingest onto a single core.

This module restores within-file parallelism with the classic Hadoop
``XmlInputFormat`` contract, re-expressed in PySpark:

1. the driver plans fixed-size byte ranges over the file (cheap: no I/O,
   just arithmetic on the file length);
2. each task opens the file at its range start and extracts every
   element that STARTS inside its range (reading past the range end for
   the tail element — the overshoot bound is explicit and violations
   raise, never truncate);
3. fragments parse JVM-side via ``from_xml`` with an explicit schema —
   the same raw shape the native source produces (attribute columns
   ``_id``/``_lat``/..., ``tag``/``nd``/``member`` child arrays, all
   strings), so ``operators/reshape.shape_elements`` consumes either
   reader unchanged. Parity is pinned by tests/test_osm_split.py.

Why token scanning is safe here (and where it isn't): in well-formed
XML, ``<`` in attribute values MUST be escaped (``&lt;``), so the byte
tokens ``<node`` and ``</node>`` can only occur as real markup — but a
bare ``>`` is LEGAL inside a quoted attribute value, so the tag-end
scan must be quote-aware (the regex below skips quoted spans; Hadoop's
XmlInputFormat gets this wrong and truncates at the first ``>``).
Same-name nesting (a ``<node>`` inside a ``<node>``) would break the
first-close-token rule; OSM's schema has no such nesting, and the
parse-time FAILFAST would surface it loudly if an input did.

Out-of-contract (same as Hadoop's XmlInputFormat): a row-tag token
inside an XML comment or CDATA section (``<!-- <node .../> -->``) would
be extracted as a real element — comment state can't be tracked across
byte-range boundaries without back-scanning the whole file. OSM planet
exports contain neither; for inputs that might, pre-strip comments or
use the native (single-task) reader, whose parity the tests pin.

Scale notes: the per-task Python work is one buffered read + token
scanning (no XML DOM); the actual field parsing happens in the JVM via
``from_xml`` under whole-stage codegen. All file I/O goes through a
pluggable :class:`RangeOpener` (``size(path)`` + ``read_range(path,
offset, length)``): :class:`LocalRangeOpener` is the default, and
:class:`FsspecRangeOpener` adapts any fsspec-style filesystem object
(s3fs / gcsfs / adlfs / pyarrow's HadoopFileSystem wrapper) — the
planning/extraction contract is byte-offset based, so the plans and the
extracted rows are identical whichever opener serves the bytes
(asserted in tests/test_osm_split.py). Openers are pickled to
executors, so a remote opener must be picklable (fsspec filesystems
are, by design).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LocalRangeOpener:
    """Default opener: plain POSIX ``open`` + ``seek``. Stateless, so
    pickling it to executors is free."""

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def read_range(self, path: str, offset: int, length: int) -> bytes:
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(length)


class FsspecRangeOpener:
    """Adapter for any fsspec-style filesystem object: needs only
    ``fs.size(path) -> int`` and ``fs.open(path, 'rb')`` returning a
    seekable binary stream — the interface every fsspec implementation
    (s3fs, gcsfs, adlfs, HTTPFileSystem, ...) provides. The fs object
    ships to executors inside each task closure; fsspec filesystems
    re-establish their connections lazily after unpickling, which is
    exactly the behavior a per-task opener needs."""

    def __init__(self, fs):
        self.fs = fs

    def size(self, path: str) -> int:
        return int(self.fs.size(path))

    def read_range(self, path: str, offset: int, length: int) -> bytes:
        with self.fs.open(path, "rb") as f:
            f.seek(offset)
            return f.read(length)

# raw-string schemas matching the native source with inferSchema=false +
# attributePrefix="_" (every attribute a string; children as struct arrays)
_ATTRS = (
    "_id string, _version string, _changeset string, _timestamp string, "
    "_user string, _uid string, _visible string"
)
RAW_SCHEMAS = {
    "node": f"struct<{_ATTRS}, _lat string, _lon string, "
    "tag array<struct<_k string, _v string>>>",
    "way": f"struct<{_ATTRS}, nd array<struct<_ref string>>, "
    "tag array<struct<_k string, _v string>>>",
    "relation": f"struct<{_ATTRS}, "
    "member array<struct<_type string, _ref string, _role string>>, "
    "tag array<struct<_k string, _v string>>>",
}


def plan_ranges(size: int, chunk_bytes: int) -> list[tuple[int, int]]:
    """[start, end) byte ranges covering the file; a record belongs to the
    range its start tag BEGINS in (the XmlInputFormat split contract)."""
    if chunk_bytes <= 0:
        raise ValueError(f"chunk_bytes must be positive, got {chunk_bytes}")
    return [(s, min(s + chunk_bytes, size)) for s in range(0, max(size, 1), chunk_bytes)]


# quote-aware scan from just after the tag name to the tag-closing '>':
# bare '>' is legal inside quoted attribute values, so skip quoted spans
_TAG_END_PAT = re.compile(rb'(?:[^>"\']|"[^"]*"|\'[^\']*\')*?(/?)>')


def extract_fragments_in_range(
    buf: bytes,
    limit: int,
    row_tag: str,
    range_origin: int = 0,
    max_element_bytes: int = 1 << 20,
    path: str = "<buffer>",
):
    """Yield every complete ``<row_tag ...>`` fragment whose start tag
    begins before ``limit`` in ``buf`` (which must extend up to
    ``max_element_bytes`` past ``limit`` for the tail element). Pure
    function — the task-side core of :func:`element_fragments`, factored
    out so property tests can sweep boundary placements without Spark."""
    open_tok = f"<{row_tag}".encode()
    close_tok = f"</{row_tag}>".encode()
    # start token followed by a name-boundary char, so row_tag "node" never
    # matches a hypothetical <nodeset>
    start_pat = re.compile(re.escape(open_tok) + rb"[\s/>]")
    pos = 0
    while True:
        m = start_pat.search(buf, pos)
        if m is None or m.start() >= limit:
            return
        s0 = m.start()
        tm = _TAG_END_PAT.match(buf, s0 + len(open_tok))
        if tm is None:
            raise ValueError(
                f"osm_split: unterminated start tag at byte {range_origin + s0} "
                f"of {path} (element larger than max_element_bytes="
                f"{max_element_bytes}? raise it)"
            )
        if tm.group(1) == b"/":
            e0 = tm.end()
        else:
            c = buf.find(close_tok, tm.end())
            if c == -1:
                raise ValueError(
                    f"osm_split: no {close_tok.decode()} within "
                    f"max_element_bytes={max_element_bytes} of the "
                    f"element at byte {range_origin + s0} of {path} — raise "
                    "max_element_bytes (loud by design, never truncate)"
                )
            e0 = c + len(close_tok)
        # fragment boundaries sit on ASCII markup bytes, so a complete
        # element is always valid UTF-8 when the document is
        yield buf[s0:e0].decode("utf-8")
        pos = e0


def element_fragments(
    spark: SparkSession,
    path: str,
    row_tag: str,
    chunk_mb: int = 64,
    max_element_bytes: int = 1 << 20,
    _chunk_bytes: int | None = None,
    opener=None,
) -> DataFrame:
    """One row per complete ``<row_tag ...>`` element fragment, extracted in
    parallel across byte ranges of a single document. ``_chunk_bytes``
    overrides ``chunk_mb`` for tests that sweep boundary positions at
    byte granularity (the extraction code under test stays THIS code).
    ``opener`` serves the bytes (default local FS; see
    :class:`FsspecRangeOpener` for remote stores) — the byte-range plan
    depends only on ``opener.size``, so identical sizes give identical
    plans across openers."""
    opener = opener or LocalRangeOpener()
    size = opener.size(path)
    ranges = plan_ranges(size, _chunk_bytes or chunk_mb * 1024 * 1024)

    def scan(ranges_iter):
        for start, end in ranges_iter:
            buf = opener.read_range(path, start, (end - start) + max_element_bytes)
            for frag in extract_fragments_in_range(
                buf, end - start, row_tag, start, max_element_bytes, path
            ):
                yield (frag,)

    rdd = spark.sparkContext.parallelize(ranges, len(ranges)).mapPartitions(scan)
    return spark.createDataFrame(rdd, "value string")


def read_elements_split(
    spark: SparkSession,
    path: str,
    row_tag: str,
    chunk_mb: int = 64,
    max_element_bytes: int = 1 << 20,
    opener=None,
) -> DataFrame:
    """Drop-in for ``osm_xml.read_elements`` on single huge documents:
    same raw column shape, N = ceil(filesize / chunk_mb) parallel tasks
    instead of 1. FAILFAST parse: a fragment the extractor got wrong is a
    bug to surface, not a row to null out."""
    if row_tag not in RAW_SCHEMAS:
        raise ValueError(f"no raw schema for rowTag {row_tag!r} (have {sorted(RAW_SCHEMAS)})")
    frags = element_fragments(
        spark, path, row_tag, chunk_mb, max_element_bytes, opener=opener
    )
    parsed = frags.select(
        F.from_xml(
            "value",
            RAW_SCHEMAS[row_tag],
            {"attributePrefix": "_", "mode": "FAILFAST"},
        ).alias("x")
    )
    return parsed.select("x.*")


def read_shaped_split(
    spark: SparkSession,
    path: str,
    fix_streets: bool = True,
    chunk_mb: int = 64,
    opener=None,
) -> DataFrame:
    """``osm_xml.read_shaped`` twin over the splittable scan — the planet-
    scale ingest path. Output schema and values are identical (pinned by
    tests/test_osm_split.py); only the scan parallelism differs.
    ``opener`` selects the byte source (local default / fsspec remote)."""
    from ..operators.reshape import shape_elements

    nodes = shape_elements(
        read_elements_split(spark, path, "node", chunk_mb, opener=opener), "node", fix_streets
    )
    ways = shape_elements(
        read_elements_split(spark, path, "way", chunk_mb, opener=opener), "way", fix_streets
    )
    return nodes.unionByName(ways)


def parse_byte_conf(value: str) -> int:
    """Parse a Spark byte-size conf string ('134217728b', '128MB', '1g',
    plain '134217728') to bytes — the subset of JavaUtils.byteStringAs
    Spark uses for spark.sql.files.maxPartitionBytes."""
    m = re.fullmatch(r"\s*(\d+)\s*([kmgtp]?b?)\s*", value, re.IGNORECASE)
    if not m:
        raise ValueError(f"unparseable byte conf value: {value!r}")
    mult = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20,
            "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40,
            "p": 1 << 50, "pb": 1 << 50}[m.group(2).lower()]
    return int(m.group(1)) * mult


def auto_split_chunk_mb(spark: SparkSession, path: str, opener=None) -> int | None:
    """Data-driven scan-path selection for ``ingest_osm``: a SINGLE
    document bigger than ~2x ``spark.sql.files.maxPartitionBytes`` (the
    size at which the native one-task-per-file XML scan has provably left
    at least half the cluster idle) returns the byte-range size in MB —
    ``maxPartitionBytes`` itself, the granularity Spark would use if the
    format were splittable. A directory of files (the native source's
    good case: one task per file) or a small single file returns None
    (use the native reader)."""
    if os.path.isdir(path):
        return None
    opener = opener or LocalRangeOpener()
    max_pb = parse_byte_conf(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    if opener.size(path) <= 2 * max_pb:
        return None
    return max(1, max_pb >> 20)
