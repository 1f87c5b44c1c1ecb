"""Stage-0 extraction kernel: text invariant + island parse."""

from osm_wayback_spark.sources.extract import (
    extract_island,
    extract_text,
    extract_versions,
    verify_text_invariant,
)
from osm_wayback_spark.synth import synth_pages, synth_pages_local

SF = 0.001


def test_text_extraction_byte_identical_local():
    pdf = synth_pages_local(SF)
    for html, text in zip(pdf["html"], pdf["text"]):
        assert extract_text(html) == text  # byte-identical per url


def test_tolerant_parser_agrees_on_synthetic():
    """extract_text_tolerant must agree with the regex fast path on
    the format-guaranteed synthetic corpus (modulo the parser's
    whitespace-exactness — the synthetic corpus has none to lose)."""
    from osm_wayback_spark.sources.extract import extract_text_tolerant

    pdf = synth_pages_local(SF)
    for html, text in zip(pdf["html"][:200], pdf["text"][:200]):
        assert extract_text_tolerant(html) == text


def test_tolerant_parser_handles_malformed_html():
    """Malformed-but-parseable real-crawl markup: unclosed <p>,
    attributes, uppercase tags, implicit close by a following <p>.
    The regex fast path mis-slices all of these; the tolerant path
    must recover the paragraph text."""
    from osm_wayback_spark.sources.extract import extract_text_tolerant

    doc = (
        b"<html><body>"
        b'<P CLASS="lead">first &amp; foremost'  # unclosed + attrs + entity
        b"<p>second one</p>"
        b"<div>ignored</div>"
        b"<p>third trailing"  # unclosed at EOF
        b"</body></html>"
    )
    got = extract_text_tolerant(doc)
    assert got.splitlines() == ["first & foremost", "second one", "third trailing"]


def test_tolerant_parser_lxml_path():
    """When lxml is installed the tolerant path uses it; skip
    otherwise (the stdlib fallback is covered above)."""
    import pytest

    from osm_wayback_spark.sources.extract import _probe_lxml, extract_text_tolerant

    if _probe_lxml() is None:
        pytest.skip("lxml not installed")
    doc = b"<p>alpha<p>beta</p>"
    assert extract_text_tolerant(doc).splitlines() == ["alpha", "beta"]


def test_tolerant_island_extraction():
    """Tolerant island pull: agrees with the exact-marker path on the
    synthetic corpus AND survives attribute reordering / single
    quotes / extra attributes / uppercase tags that the verbatim
    `_MARK` locate cannot."""
    from osm_wayback_spark.sources.extract import extract_island_tolerant

    pdf = synth_pages_local(SF)
    for html in pdf["html"][:100]:
        assert extract_island_tolerant(html) == extract_island(html)

    messy = (
        b"<html><body><p>x</p>"
        b"<SCRIPT id=geo type='application/osm+json' async>"
        b'{"element_type":"node","id":7,"version":1,"ts":5}'
        b"</SCRIPT></body></html>"
    )
    assert extract_island(messy) is None  # fast path: marker mismatch
    isl = extract_island_tolerant(messy)
    assert isl == {"element_type": "node", "id": 7, "version": 1, "ts": 5}
    assert extract_island_tolerant(b"<p>no island</p>") is None


def test_extract_versions_tolerant_matches_fast(spark):
    """The distributed tolerant kernel produces the same versions
    table as the fast path on the format-guaranteed corpus."""
    pages = synth_pages(spark, SF)
    fast = extract_versions(pages).orderBy("element_type", "id", "version")
    tol = extract_versions(pages, tolerant=True).orderBy(
        "element_type", "id", "version"
    )
    assert fast.collect() == tol.collect()


def test_island_parses_every_page():
    pdf = synth_pages_local(SF)
    for html in pdf["html"]:
        isl = extract_island(html)
        assert isl is not None
        assert {"element_type", "id", "version", "ts"} <= set(isl)


def test_text_invariant_distributed(spark):
    pages = synth_pages(spark, SF)
    assert verify_text_invariant(pages).count() == 0


def test_extract_versions_matches_local(spark):
    pages = synth_pages(spark, SF)
    got = extract_versions(pages).count()
    assert got == len(synth_pages_local(SF))


def test_synth_is_partition_independent(spark):
    a = synth_pages(spark, SF).orderBy("url", "warc_ts").collect()
    b = (
        synth_pages(spark, SF)
        .repartition(3)
        .orderBy("url", "warc_ts")
        .collect()
    )
    assert a == b


def test_native_extraction_matches_arrow_kernel(spark):
    from osm_wayback_spark.sources.extract import extract_versions_native

    pages = synth_pages(spark, SF)
    a = extract_versions(pages).orderBy("element_type", "id", "version").collect()
    b = (
        extract_versions_native(pages)
        .orderBy("element_type", "id", "version")
        .collect()
    )
    assert a == b


def _page_row(url, warc_ts, island_json, body="hello world"):
    import datetime

    html = (
        f"<html><body><p>{body}</p>"
        f'<script type="application/osm+json">{island_json}</script>'
        f"</body></html>"
    ).encode()
    return (url, datetime.datetime.fromisoformat(warc_ts), html, body, "en")


def test_multiline_island_native_matches_arrow(spark):
    """A pretty-printed (multi-line) JSON island must survive BOTH
    extraction paths — the JVM regex needs (?s) to cross newlines."""
    from osm_wayback_spark.schemas import PAGES
    from osm_wayback_spark.sources.extract import extract_versions_native

    island = (
        '{\n  "element_type": "node",\n  "id": 1,\n  "version": 1,\n'
        '  "ts": 1000,\n  "changeset": 5,\n  "uid": 7,\n  "user": "a",\n'
        '  "visible": true,\n  "deleted": false,\n'
        '  "tags": {"k": "v"},\n  "lonlat": [1.5, 2.5]\n}'
    )
    pages = spark.createDataFrame(
        [_page_row("u://1", "2024-01-01T00:00:00", island)], schema=PAGES
    )
    a = extract_versions(pages).collect()
    b = extract_versions_native(pages).collect()
    assert len(a) == len(b) == 1
    assert a == b
    assert a[0].tags == {"k": "v"}


def test_dedup_versions_last_write_wins(spark):
    """Two crawls of the same (entity, version) keep only the later
    crawl's record (RocksDB put overwrite semantics)."""
    import json as _json

    from osm_wayback_spark.schemas import PAGES
    from osm_wayback_spark.sources.extract import (
        dedup_versions,
        extract_versions_native,
    )

    def isl(version, ts, tag):
        return _json.dumps(
            {
                "element_type": "node",
                "id": 9,
                "version": version,
                "ts": ts,
                "changeset": 1,
                "uid": 1,
                "user": "u",
                "visible": True,
                "deleted": False,
                "tags": {"crawl": tag},
                "lonlat": [0.0, 0.0],
            }
        )

    rows = [
        _page_row("u://9", "2024-01-01T00:00:00", isl(1, 100, "early")),
        _page_row("u://9", "2024-06-01T00:00:00", isl(1, 100, "late")),
        _page_row("u://9", "2024-01-02T00:00:00", isl(2, 200, "only")),
    ]
    pages = spark.createDataFrame(rows, schema=PAGES)
    out = dedup_versions(extract_versions_native(pages)).orderBy("version").collect()
    assert [r.version for r in out] == [1, 2]
    assert out[0].tags == {"crawl": "late"}  # max warc_ts wins
    assert "warc_ts" not in out[0].asDict()
