"""End-to-end golden test: the Spark pipeline vs a driver-side
re-execution of the reference stages over identical inputs.

The Spark side must produce, per feature, exactly the per-version
feature set the reference's stage 4 would emit given the same
@history + nodeLocations (the core itself is branch-tested in
test_reconstruction_core.py)."""

import json

import pytest

from osm_wayback_spark import pipeline
from osm_wayback_spark.operators._reconstruct_core import reconstruct_feature
from osm_wayback_spark.synth import synth_pages

from .oracle import (
    add_history_oracle,
    build_index,
    extract_all,
    node_locations_oracle,
)

SF = 0.001


@pytest.fixture(scope="module")
def spark_outputs(spark):
    pages = synth_pages(spark, SF)
    rows = pipeline.reconstruction_pipeline(pages, with_feature_json=True).collect()
    by_key: dict[tuple, list[str]] = {}
    for r in rows:
        by_key.setdefault((r.element_type, r.id), []).append(r.feature_json)
    return {k: sorted(v) for k, v in by_key.items()}


@pytest.fixture(scope="module")
def oracle_outputs():
    versions, locs, features = build_index(extract_all(SF))
    histories = add_history_oracle(versions, features)
    nested = node_locations_oracle(histories, features, locs)
    out: dict[tuple, list[str]] = {}
    for key, feat in features.items():
        feats = reconstruct_feature(
            key[0],
            key[1],
            feat.get("geometry"),
            histories.get(key) or [],
            nested.get(key),
        )
        if feats:
            out[key] = sorted(
                json.dumps(f, separators=(",", ":"), sort_keys=True)
                for f in feats
            )
    return out


def test_feature_keys_match(spark_outputs, oracle_outputs):
    assert set(spark_outputs) == set(oracle_outputs)


def test_per_version_features_match(spark_outputs, oracle_outputs):
    assert len(oracle_outputs) > 100
    mismatches = [
        k for k in oracle_outputs if spark_outputs[k] != oracle_outputs[k]
    ]
    assert not mismatches, (
        f"{len(mismatches)} features mismatch; first: {mismatches[:3]}\n"
        + "\n".join(spark_outputs[mismatches[0]][:2])
        + "\n---\n"
        + "\n".join(oracle_outputs[mismatches[0]][:2])
    )


def test_minor_versions_exist(oracle_outputs):
    # the synthetic corpus must exercise the minor-version machinery
    n_minor = sum(
        1
        for feats in oracle_outputs.values()
        for f in feats
        if json.loads(f)["properties"].get("@minorVersion", 0) > 0
    )
    assert n_minor > 10
