"""Stage-0 extraction kernel: pages → versions / features / text.

Plays the role of the reference's libosmium parse + osmium export
(build_lookup_index.cpp:101-103, run.sh:18-20): the one genuinely new
operator of the graft. A vectorized pandas UDF over ``mapInPandas``
(Arrow-batched — no per-row Python dispatch from the JVM) that

1. extracts canonical visible text from ``html`` — the per-row
   invariant is that ``extract_text(html) == text`` **byte-identically
   per url** (BASELINE.json input_hint), and
2. parses the page-embedded geometry payload (the
   ``application/osm+json`` island) into a typed ``versions`` row.

Everything downstream of this kernel is relational (DataFrame ops).
"""

from __future__ import annotations

import html as _html
import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import VERSIONS

_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_ISLAND_RE = re.compile(
    r'<script type="application/osm\+json">(.*?)</script>', re.DOTALL
)


def extract_text(html_bytes: bytes) -> str:
    """Canonical text extraction: all <p> bodies, unescaped, joined
    by newline. Must be byte-identical to the ``text`` column."""
    doc = html_bytes.decode("utf-8", errors="replace")
    return "\n".join(_html.unescape(m) for m in _P_RE.findall(doc))


def _probe_lxml():
    """Pillow-pattern probe (see operators/multimodal.py): import the
    optional real-HTML parser at call time, never at module import."""
    try:
        import lxml.html as lh  # noqa: PLC0415

        return lh
    except ImportError:
        return None


from html.parser import HTMLParser as _HTMLParser


class _PParser(_HTMLParser):
    """Event half of _PTextParser — module-level so instantiating a
    parser per page does not also CREATE A CLASS per page (the old
    closure-class form paid type creation on every document; guide
    §4.5: construct heavyweight state as rarely as possible)."""

    def __init__(self, outer: "_PTextParser") -> None:
        super().__init__(convert_charrefs=True)
        self._outer = outer

    def handle_starttag(self, tag, attrs):
        if tag == "p":
            self._outer._flush()
            self._outer.open = True

    def handle_endtag(self, tag):
        if tag == "p":
            self._outer._flush()

    def handle_data(self, data):
        if self._outer.open:
            self._outer.cur.append(data)


class _PTextParser:
    """Tolerant <p>-text extraction on the stdlib HTMLParser: handles
    unclosed tags, attributes, case-insensitive tag names, and the
    browser rule that a new <p> implicitly closes an open one. Used
    when lxml is absent (it is stdlib, so the tolerant path always
    exists)."""

    def __init__(self) -> None:
        self.open = False
        self.cur: list[str] = []
        self.parts: list[str] = []
        self._parser = _PParser(self)

    def _flush(self) -> None:
        if self.open:
            self.parts.append("".join(self.cur))
        self.open = False
        self.cur = []

    def run(self, doc: str) -> str:
        self._parser.feed(doc)
        self._parser.close()
        self._flush()  # unclosed trailing <p>
        return "\n".join(self.parts)


def extract_text_tolerant(html_bytes: bytes) -> str:
    """Real-crawl text extraction: a TOLERANT HTML parse (lxml when
    installed, else the stdlib html.parser) instead of the regex fast
    path — survives unclosed/malformed markup, attributes, and case
    variation that `_P_RE` would mis-slice. On the well-formed
    synthetic microformat it agrees with ``extract_text`` (pytest-
    pinned); the regex/locate path stays the default because the
    synthetic corpus is format-guaranteed and the reference's own
    extraction (osmium export, run.sh:20) is equally
    input-format-bound."""
    doc = html_bytes.decode("utf-8", errors="replace")
    lh = _probe_lxml()
    if lh is not None:
        tree = lh.document_fromstring(doc)
        return "\n".join(p.text_content() for p in tree.iter("p"))
    return _PTextParser().run(doc)


class _SIslandParser(_HTMLParser):
    """Tolerant island-script scanner — module-level for the same
    no-class-per-page reason as _PParser."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.in_island = False
        self.body: list[str] = []
        self.done = False

    def handle_starttag(self, tag, attrs):
        if self.done or tag != "script":
            return
        if dict(attrs).get("type", "").strip() == "application/osm+json":
            self.in_island = True

    def handle_endtag(self, tag):
        if tag == "script" and self.in_island:
            self.in_island = False
            self.done = True

    def handle_data(self, data):
        if self.in_island:
            self.body.append(data)


def extract_island_tolerant(html_bytes: bytes) -> dict | None:
    """Real-crawl island extraction: pull the first
    ``application/osm+json`` script body with a tolerant HTML parse
    instead of the exact-marker locate — survives attribute
    reordering, single quotes, extra attributes and case variation
    (`<SCRIPT id=x type='application/osm+json'>`), which the
    `_MARK` fast path requires verbatim. Same fallback-probe pattern
    as extract_text_tolerant."""
    doc = html_bytes.decode("utf-8", errors="replace")
    p = _SIslandParser()
    p.feed(doc)
    p.close()
    if not p.body:
        return None
    try:
        return json.loads("".join(p.body))
    except json.JSONDecodeError:
        return None


def extract_island(html_bytes: bytes) -> dict | None:
    doc = html_bytes.decode("utf-8", errors="replace")
    m = _ISLAND_RE.search(doc)
    if not m:
        return None
    try:
        return json.loads(m.group(1))
    except json.JSONDecodeError:
        return None


# warc_ts rides along so ``dedup_versions`` can apply the RocksDB
# last-write-wins semantics (db.hpp key design: a re-crawled version
# overwrites the earlier put) — dropped again right after the dedup.
_VERSIONS_OUT_COLS = [f.name for f in VERSIONS.fields] + [
    "geometry_json",
    "warc_ts",
]
# StructType.add mutates in place — build the extended schema once,
# from a copy.
_VERSIONS_EXT = T.StructType(
    list(VERSIONS.fields)
    + [
        T.StructField("geometry_json", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
    ]
)

# Typed island schema for the JVM-native parse (geometry handled
# separately: its nesting depth varies by type, so it stays a JSON
# string pulled by regexp — GeoJSON objects contain no nested braces).
_ISLAND_SCHEMA = T.StructType(
    [f for f in VERSIONS.fields if f.name not in ("element_type", "id")]
    + [
        T.StructField("element_type", T.StringType()),
        T.StructField("id", T.LongType()),
    ]
)

# (?s): the Arrow kernel compiles with re.DOTALL; the JVM path needs
# the inline flag or a pretty-printed (multi-line) island would be
# silently dropped by the isNotNull filter — parity tested on a
# multi-line fixture in test_extract.py.
_ISLAND_RE_SQL = r'(?s)<script type="application/osm\+json">(.*?)</script>'
_GEOM_RE_SQL = r'"geometry":(\{[^{}]*\})'


_MARK = '<script type="application/osm+json">'
_END = "</script>"


def extract_versions_native(pages: DataFrame) -> DataFrame:
    """pages → versions, 100% JVM-side (locate/substr island pull +
    ``from_json``): the throughput path. Bit-identical to the Arrow
    kernel (tested); whole-stage-codegen keeps the hot loop off
    Python entirely, which matters both for absolute pages/sec and
    for N→4N scaling (a mapInPandas task burns ~2 cores — JVM
    serializer + Python worker — so Python extraction halves
    effective parallelism).

    The island is pulled with locate + substring_index rather than a
    lazy-dot regex — same first-match semantics (first marker, first
    closing tag), measurably cheaper per page (0.95 s → 0.72 s for
    131K pages at local[32]); the regex form is kept in
    ``_ISLAND_RE_SQL`` for reference/fallback."""
    doc = F.decode(F.col("html"), "UTF-8")
    start = F.locate(_MARK, doc)
    rest = doc.substr(start + F.lit(len(_MARK)), F.length(doc))
    island = F.when(
        (start > 0) & (F.locate(_END, rest) > 0),
        F.substring_index(rest, _END, 1),
    )
    parsed = F.from_json(island, _ISLAND_SCHEMA)
    geom = F.regexp_extract(island, _GEOM_RE_SQL, 1)
    return (
        pages.select(
            parsed.alias("r"),
            F.when(geom != "", geom).alias("geometry_json"),
            F.col("warc_ts"),
        )
        .filter(F.col("r").isNotNull() & F.col("r.element_type").isNotNull())
        .select(
            *[
                F.coalesce(
                    F.col("r.tags"), F.create_map().cast("map<string,string>")
                ).alias("tags")
                if f.name == "tags"
                else F.col(f"r.{f.name}").alias(f.name)
                for f in VERSIONS.fields
            ],
            "geometry_json",
            "warc_ts",
        )
        # keep column order identical to the Arrow kernel
        .select(*_VERSIONS_OUT_COLS)
    )


def extract_versions(pages: DataFrame, tolerant: bool = False) -> DataFrame:
    """pages → versions (+ geometry_json carried on the row that
    embeds the current geometry). One Arrow pass; narrow (no shuffle).

    ``tolerant=True`` swaps the exact-marker island pull for the
    tolerant HTML parse (extract_island_tolerant) — the real-crawl
    configuration where markup isn't format-guaranteed; ~3× slower
    per page, identical output on well-formed input (pytest-pinned).
    """
    pull = extract_island_tolerant if tolerant else extract_island

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for html_bytes, wts in zip(pdf["html"], pdf["warc_ts"]):
                isl = pull(html_bytes)
                if isl is None:
                    continue
                geom = isl.get("geometry")
                rows.append(
                    {
                        "element_type": isl["element_type"],
                        "id": int(isl["id"]),
                        "version": int(isl["version"]),
                        "ts": int(isl["ts"]),
                        "changeset": isl.get("changeset"),
                        "uid": isl.get("uid"),
                        "user": isl.get("user"),
                        "visible": isl.get("visible"),
                        "deleted": isl.get("deleted"),
                        "tags": isl.get("tags") or {},
                        "lonlat": isl.get("lonlat"),
                        "node_refs": isl.get("node_refs"),
                        "geometry_json": json.dumps(geom, separators=(",", ":"))
                        if geom is not None
                        else None,
                        "warc_ts": wts,
                    }
                )
            yield pd.DataFrame(rows, columns=_VERSIONS_OUT_COLS)

    return pages.mapInPandas(kernel, schema=_VERSIONS_EXT)


def dedup_versions(versions_ext: DataFrame) -> DataFrame:
    """Last-write-wins per (element_type, id, version): a page crawled
    twice for the same version keeps only the latest crawl (max
    warc_ts), matching the reference's RocksDB put semantics (db.hpp —
    the version-keyed put overwrites). Without this, duplicate crawls
    would yield duplicate @history records and a skewed lag-based tag
    diff.

    One window on (element_type, id) — the SAME partitioning as the
    tag-diff window and the history join downstream, so Catalyst plans
    a single Exchange for all three.
    """
    w = Window.partitionBy("element_type", "id").orderBy(
        "version", F.desc("warc_ts")
    )
    return (
        versions_ext.withColumn("_pv", F.lag("version").over(w))
        .filter(F.col("_pv").isNull() | (F.col("_pv") != F.col("version")))
        .drop("_pv", "warc_ts")
    )


def verify_text_invariant(pages: DataFrame) -> DataFrame:
    """Rows where extraction is NOT byte-identical (must be empty)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bad = pdf[
                [extract_text(h) != t for h, t in zip(pdf["html"], pdf["text"])]
            ]
            yield bad[["url", "text"]]

    return pages.mapInPandas(kernel, schema="url string, text string")


def features_from_versions(versions_ext: DataFrame) -> DataFrame:
    """Latest version per entity → the current-feature stream
    (≙ osmium time-filter + export, run.sh:18-20; SURVEY.md S2/S3).

    Single shuffle on (element_type, id) via max_by-style window.
    """
    w = Window.partitionBy("element_type", "id").orderBy(F.desc("version"))
    return (
        versions_ext.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & F.col("geometry_json").isNotNull())
        .select(
            "element_type",
            "id",
            "version",
            "changeset",
            "ts",
            "uid",
            "user",
            F.col("geometry_json").alias("geometry"),
            "tags",
        )
    )


def node_locations_from_versions(versions: DataFrame) -> DataFrame:
    """≙ the `locations` CF build (db.hpp:225-258): per (node_id,
    changeset) keep the max-version record (json_encoding.hpp:51-57 —
    two versions in one changeset lose the earlier one). The
    read-modify-write upsert becomes a window dedup.
    """
    w = Window.partitionBy("id", "changeset").orderBy(F.desc("version"))
    return (
        versions.filter(F.col("element_type") == "node")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("id").alias("node_id"),
            "changeset",
            "version",
            "ts",
            "uid",
            "user",
            "lonlat",
        )
    )
