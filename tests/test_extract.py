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
