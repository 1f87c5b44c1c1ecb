"""JSONL pages source/sink: lossless round-trip + pipeline parity."""


def test_jsonl_roundtrip_lossless(spark, tmp_path):
    from osm_wayback_spark.sources.jsonl import (
        read_pages_jsonl,
        write_pages_jsonl,
    )
    from osm_wayback_spark.synth import synth_pages

    pages = synth_pages(spark, 0.001)
    path = str(tmp_path / "pages_jsonl")
    write_pages_jsonl(pages, path)
    back = read_pages_jsonl(spark, path)
    # names + types identical (JSON-sourced columns are nullable by
    # construction, so nullability flags legitimately differ)
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in pages.schema
    ]
    a = sorted(pages.collect(), key=lambda r: (r.url, r.warc_ts))
    b = sorted(back.collect(), key=lambda r: (r.url, r.warc_ts))
    assert a == b  # bytes, timestamps, nulls — everything


def test_jsonl_feeds_pipeline_identically(spark, tmp_path):
    """The JSONL-sourced pages produce the identical versions table
    (the whole engine is source-agnostic past the PAGES schema)."""
    from osm_wayback_spark import pipeline
    from osm_wayback_spark.sources.jsonl import (
        read_pages_jsonl,
        write_pages_jsonl,
    )
    from osm_wayback_spark.synth import synth_pages

    pages = synth_pages(spark, 0.001)
    path = str(tmp_path / "pages_jsonl2")
    write_pages_jsonl(pages, path, compress=False)
    v1 = pipeline.build_tables(pages, reuse=False)["versions"]
    v2 = pipeline.build_tables(read_pages_jsonl(spark, path), reuse=False)[
        "versions"
    ]
    key = lambda r: (r.element_type, r.id, r.version)  # noqa: E731
    assert sorted(v1.collect(), key=key) == sorted(v2.collect(), key=key)
