"""Deduplication operators over a documents(doc_id, text, ...) table.

Four families, each a ``queries()`` entry with a DuckDB oracle:
- exact:       hash-groupBy on normalized text
- MinHash+LSH: per-row shingle-array minhash signatures
               (shuffle-free) → banded buckets → candidate pairs →
               exact-Jaccard verify
- SimHash:     per-token 48-bit hash, weighted bit votes
- n-gram Jaccard: shingle explode + self-join

Hash function choice: md5 (lexicographic min over hex strings ≡ min
over the 128-bit integer) because Spark and DuckDB produce identical
md5 hex — the whole dedup stack is thus oracle-checkable bit-for-bit.

Scale notes: signatures are per-row column math (no shuffle at
all); pair generation is explode → shuffle-on-short-key →
equi-join; no Python anywhere. n-gram self-join caps shingle
document frequency (`max_df`) so planet-hot shingles ("the of and")
don't produce quadratic candidates — the cap is logged, not silent.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from ..functions.text import shingles
from ..plans.parallel import fanout_small

logger = logging.getLogger(__name__)

DEFAULT_NUM_HASHES = 12
DEFAULT_BANDS = 4  # 3 rows per band at 12 hashes


def _cap_buckets(
    bucketed: DataFrame, keys: list[str], max_bucket: int | None, what: str
) -> DataFrame:
    """Hot-bucket guard for pair generation: drop buckets with more
    than ``max_bucket`` members BEFORE the self-join, and log how many
    were dropped (never silent). A single degenerate bucket — a few
    million boilerplate-identical docs that survive exact dedup by one
    byte — otherwise self-joins O(n²); members of a dropped bucket can
    still pair through their other bands/chunks. The membership count
    is a window over the same keys the join shuffles on, so no extra
    exchange is introduced; the logged count is one small extra job,
    only when the cap is enabled."""
    if max_bucket is None:
        return bucketed
    w = Window.partitionBy(*keys)
    capped = bucketed.withColumn("_bn", F.count("*").over(w))
    dropped = (
        capped.filter(F.col("_bn") > max_bucket).select(*keys).distinct().count()
    )
    if dropped:
        logger.warning(
            "%s: dropped %d hot bucket(s) with > %d members before "
            "pair generation", what, dropped, max_bucket,
        )
    return capped.filter(F.col("_bn") <= max_bucket).drop("_bn")


def exact_dedup(documents: DataFrame) -> DataFrame:
    """→ (doc_id, keep_id, is_dup): keep_id = min doc_id per identical
    text. One shuffle on md5(text) (short key, not the full text)."""
    return _exact_from_keyed(
        documents.select("doc_id", F.md5("text").alias("h"))
    )


def _exact_from_keyed(keyed: DataFrame) -> DataFrame:
    """exact_dedup over a pre-hashed (doc_id, h) frame (staged path)."""
    keep = keyed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    return (
        keyed.join(keep, on="h")
        .select(
            "doc_id",
            "keep_id",
            (F.col("doc_id") != F.col("keep_id")).alias("is_dup"),
        )
    )


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    return fanout_small(documents).select(
        "doc_id", F.explode(shingles(F.col("text"), n)).alias("shingle")
    )


def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """→ (doc_id, sig_0..sig_{H-1}); sig_i = min over shingles of
    hash(i-salted shingle).

    SHUFFLE-FREE (round 4): a MinHash signature depends only on its
    own row's shingles, so it is pure column math — array_min over a
    transform of the per-row shingle array. The previous shape
    (explode → groupBy(doc_id)) shuffled ~|shingles per doc| × corpus
    rows to compute a per-row value; at 100 TB that shuffle dwarfs
    the hashing itself (measured at sf0.1: 3.8 s → 0.6 s). The DuckDB
    oracle keeps its unnest+GROUP BY formulation — same result, so
    the rewrite is hash-checked, and distinctness of the shingle set
    is irrelevant (min is idempotent to duplicates).

    ``hash_fn="md5"`` (default): hex-string min — the oracle-parity
    configuration (Spark and DuckDB md5 agree bit-for-bit, and the
    lexicographic min over hex ≡ min over the 128-bit integer).
    ``hash_fn="xxhash64"``: native 64-bit integer hash (no hex
    string materialization) — the planet-scale configuration where
    DuckDB parity is not needed. Downstream banding
    (lsh_candidate_pairs) works on either: the band hash
    md5(concat_ws) stringifies longs deterministically."""
    shingled = documents.select(
        "doc_id", shingles(F.col("text"), n).alias("_sh")
    )
    return minhash_signatures_from_shingles(shingled, num_hashes, hash_fn)


def minhash_signatures_from_shingles(
    shingled: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    hash_fn: str = "md5",
) -> DataFrame:
    """minhash_signatures over a PRE-SHINGLED (doc_id, _sh) frame —
    the staged-corpus path (dedupe_corpus(stage_dir=...)): the
    tokenize+shingle pass is paid once and reused."""
    if hash_fn == "xxhash64":
        def sig(i):
            return F.array_min(
                F.transform("_sh", lambda s: F.xxhash64(F.lit(i), s))
            )
    elif hash_fn == "md5":
        def sig(i):
            return F.array_min(
                F.transform(
                    "_sh", lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))
                )
            )
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    return (
        shingled.filter(F.size("_sh") > 0)  # ≙ the docs the groupBy form kept
        .select(
            "doc_id", *[sig(i).alias(f"sig_{i}") for i in range(num_hashes)]
        )
    )


def band_buckets(
    signatures: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    id_col: str = "doc_id",
    id_out: str | None = None,
) -> DataFrame:
    """Banded LSH bucket rows → (``id_out``, band, bh).

    Band hash = md5(concat_ws('|') of the band's signature slots) —
    works on both the md5-hex and xxhash64-integer signature paths
    (concat_ws stringifies longs deterministically). THE one banding
    definition: ``lsh_candidate_pairs`` (batch self-join) and
    ``streaming_near_dup_flags`` (stream-static join) both call this,
    so corpus bucket tables precomputed by one path are always
    compatible with the other (cross-checked by pytest)."""
    id_out = id_out or id_col
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bh")
            )
        )
    return signatures.select(
        F.col(id_col).alias(id_out), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_out, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    max_bucket: int | None = None,
) -> DataFrame:
    """→ distinct (doc_a, doc_b) sharing ≥1 LSH band bucket (a < b).

    Banding via the shared ``band_buckets`` helper. The bucket-join
    is an equi-join on (band, band_hash) — broadcastable when one
    side is small, AQE-skew-split otherwise. ``max_bucket`` drops
    degenerate hot buckets before the self-join (logged; see
    _cap_buckets) — None (default) is the exact/oracle-parity
    configuration; set it at planet scale.
    """
    buckets = band_buckets(signatures, num_hashes, bands)
    buckets = _cap_buckets(buckets, ["band", "bh"], max_bucket, "lsh_candidate_pairs")
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bh") == F.col("b.bh"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing ≥1 shingle.

    → (doc_a, doc_b, jaccard) with jaccard ≥ threshold. ``max_df``
    drops shingles appearing in more than that many docs before the
    self-join (quadratic-blowup guard at planet scale); pass None to
    disable (the oracle-parity configuration). ``shingled`` (a
    (doc_id, _sh) frame, e.g. the dedupe_corpus stage table)
    overrides re-deriving shingles from the raw text — this operator
    otherwise evaluates the tokenize+shingle expression ~4× (df
    filter, sizes, both self-join sides)."""
    if shingled is not None:
        sh = fanout_small(shingled).select(
            "doc_id", F.explode("_sh").alias("shingle")
        )
    else:
        sh = doc_shingles(documents, n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.countDistinct("doc_id").alias("df"))
        sh = sh.join(
            F.broadcast(df_counts.filter(F.col("df") <= max_df).select("shingle")),
            on="shingle",
        )
    sizes = sh.groupBy("doc_id").agg(F.countDistinct("shingle").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.countDistinct(F.col("a.shingle")).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), on="doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def minhash_dedup(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "md5",
    max_bucket: int | None = None,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard.
    → (doc_a, doc_b, jaccard). ``hash_fn="xxhash64"`` selects the
    native-integer signature path (see minhash_signatures);
    ``max_bucket`` is the hot-bucket cap applied before the LSH
    self-join (logged, see _cap_buckets; None = exact). ``shingled``
    (a (doc_id, _sh) frame) overrides re-deriving shingles from
    ``documents`` — the staged-corpus path, see dedupe_corpus."""
    if shingled is None:
        shingled = fanout_small(documents).select(
            "doc_id", shingles(F.col("text"), n).alias("_sh")
        )
    else:
        # staged-table path: the compact (doc_id, _sh) parquet is a
        # scan-adjacent frame — same tiny-file single-task hazard
        shingled = fanout_small(shingled)
    sigs = minhash_signatures_from_shingles(shingled, num_hashes, hash_fn)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, max_bucket=max_bucket)
    return _verify_jaccard_arrays(cands, shingled, threshold)


def _verify_jaccard_arrays(
    cands: DataFrame, shingled: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification directly on the per-doc DISTINCT
    shingle ARRAYS (r7): two equi-joins attach each candidate side's
    array, then intersection/sizes are per-row set math
    (array_intersect is hash-based, O(|a|+|b|)).

    Replaces the r6 exploded-shingle form (explode -> two
    shingle-level joins -> aggregations -> size joins) where the
    arrays are already at hand: that shape paid explode → two
    shingle-level joins → two aggregations → two size joins — five
    extra shuffles of |shingles-per-doc| × rows. Identical result:
    shingles() arrays are array_distinct, so size(array_intersect)
    == countDistinct(shared shingle), and pairs with an empty
    intersection are dropped explicitly (the exploded form's inner
    join dropped them implicitly)."""
    a = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("_sh").alias("_sha")
    )
    b = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("_sh").alias("_shb")
    )
    inter = F.size(F.array_intersect("_sha", "_shb"))
    return (
        cands.join(a, on="doc_a")
        .join(b, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("_i"),
            F.size("_sha").alias("_sa"),
            F.size("_shb").alias("_sb"),
        )
        .filter(F.col("_i") > 0)
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("_i") / (F.col("_sa") + F.col("_sb") - F.col("_i")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


SIMHASH_BITS = 48  # fits a signed 64-bit long in both engines


def simhash(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """→ (doc_id, simhash): weighted bit votes over token hashes.

    Token hash = first 12 hex chars of md5(token) (48 bits), weights =
    token multiplicity. Pure column math (conv + bit ops) so the
    DuckDB oracle can mirror it exactly.
    """
    toks = fanout_small(documents).select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    counted = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    h = F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")
    counted = counted.withColumn("h", h)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    voted = counted.groupBy("doc_id").agg(*votes)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return voted.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_pairs(
    sim: DataFrame, bits: int = SIMHASH_BITS, chunks: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup candidates: docs sharing ≥1 of `chunks` bit-slices
    (detects pairs within hamming distance < chunks by pigeonhole).
    ``max_bucket`` drops degenerate hot slices before the self-join
    (logged; see _cap_buckets); None is the exact configuration."""
    width = bits // chunks
    slices = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("simhash"), c * width)
            .bitwiseAND(F.lit(2**width - 1))
            .alias("val"),
        )
        for c in range(chunks)
    ]
    bucketed = sim.select(
        "doc_id", F.explode(F.array(*slices)).alias("s")
    ).select("doc_id", "s.chunk", "s.val")
    bucketed = _cap_buckets(bucketed, ["chunk", "val"], max_bucket, "simhash_pairs")
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.val") == F.col("b.val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _cc_star(edges: DataFrame, max_rounds: int = 30) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) → (node, component)
    for every node appearing in ``edges`` (src/dst columns).

    Converges in O(log n) rounds regardless of component diameter —
    the planet-scale path; min-label propagation (diameter rounds)
    stays the default because its per-round plan is simpler and the
    DuckDB recursive-CTE oracle mirrors it directly.

    Edges are kept canonical (u > v). Per round:
    - large-star: connect every strictly-larger neighbor of u to
      m(u) = min(Γ(u) ∪ {u})   (over the bidirected edge set)
    - small-star: connect u and its smaller neighbors to their min.
    Terminates when the edge set is a fixpoint (then it IS the star:
    every node points at its component's minimum)."""
    # one eager checkpoint of the raw edge list: ``edges`` is usually
    # a lazy LSH+verify DAG and is consumed twice below (nodes + the
    # canonical set) — without this the whole pipeline ran twice
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    e = (
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_e = e.count()
    for _ in range(max_rounds):
        bidir = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m1 = (
            bidir.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .withColumn("m", F.least("_mn", "u"))
            .select("u", "m")
        )
        large = (
            bidir.join(m1, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        m2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(m2, on="u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m2.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)  # cut per-round lineage
        )
        n_small = small.count()
        if n_small == n_e and small.exceptAll(e).isEmpty():
            e = small
            break
        e, n_e = small, n_small
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    return (
        nodes.join(e, nodes.node == e.u, "left")
        .select("node", F.coalesce(F.col("v"), F.col("node")).alias("component"))
    )


def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 20,
    algorithm: str = "minlabel",
) -> DataFrame:
    """Near-duplicate CLUSTERING: undirected candidate pairs →
    (node, component) with component = min node id reachable.

    ``algorithm="minlabel"`` (default): iterative min-label
    propagation — each round every node takes the min of its own
    label and its neighbors' labels; converges in (component
    diameter) rounds — near-dup clusters are shallow, and
    ``max_iters`` bounds the pathological chain. Each round is one
    join + one groupBy on the node id, and ONE driver action: the
    convergence probe is an observe() metric collected by the same
    job that checkpoints the round (r7). This simple form keeps the
    DuckDB recursive-CTE oracle exact.

    ``algorithm="star"``: large-star/small-star contraction —
    O(log n) rounds regardless of diameter, the planet-scale path
    (equivalence to minlabel pinned by pytest at sf0.01).
    """
    if algorithm == "star":
        edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        return _cc_star(edges, max_rounds=max_iters + 10)
    # eager-checkpoint the edge list ONCE before iterating: ``pairs``
    # is typically a lazy LSH+verify DAG, and without this every
    # round's two actions re-ran that whole pipeline (profiled 21.6 s
    # → 2.9 s for the dedupe_corpus CC stage at sf0.1). The edge set
    # is candidate-bounded — the standard persist point of every
    # iterative graph algorithm on Spark.
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iters):
        # ONE job per round (r7; was two): the union carries an
        # _orig flag so the round's aggregate can recover each node's
        # previous label (max over the single flagged row) next to
        # the new min — and the convergence probe rides the
        # checkpoint job as an observe() metric instead of a second
        # join+count job. Labels only ever decrease, so
        # "any label < _old" is exactly the old new!=old probe.
        msgs = (
            edges.join(labels, edges.dst == labels.node)
            .select(
                F.col("src").alias("node"),
                "label",
                F.lit(False).alias("_orig"),
            )
        )
        new_labels = (
            labels.select("node", "label", F.lit(True).alias("_orig"))
            .unionByName(msgs)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("_orig"), F.col("label"))).alias("_old"),
            )
        )
        obs = Observation()
        new_labels = new_labels.observe(
            obs,
            F.sum(
                F.when(F.col("label") < F.col("_old"), 1).otherwise(0)
            ).alias("changed"),
        ).select("node", "label")
        # checkpoint materializes the round (cutting the growing
        # lineage) AND completes the observation in the same job
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = obs.get["changed"] or 0
        labels = new_labels
        if changed == 0:
            break
    else:
        # min-label propagation advances one hop per round: a
        # component whose diameter exceeds max_iters would otherwise
        # be returned silently SPLIT. Never silent.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "rounds (a component's diameter exceeds max_iters); raise "
            "max_iters or use the large-star/small-star contraction"
        )
    return labels.select("node", F.col("label").alias("component"))


def line_dedup(
    documents: DataFrame, min_chars: int = 30, sep: str = "\n"
) -> DataFrame:
    """Corpus-wide LINE-level exact dedup (the C4/MassiveText recipe:
    any line occurring more than once in the corpus survives only at
    its FIRST occurrence) → (doc_id, text, n_lines, n_dropped) with
    ``text`` reassembled from the surviving lines.

    First occurrence = smallest (doc_id, line index) — deterministic
    and partition-invariant. Lines shorter than ``min_chars`` are
    always kept: dropping every repeated "", "---" or "Introduction"
    would shred unrelated documents; the recipe targets boilerplate
    runs, which are long.

    Scale shape: first-occurrence is a min-struct AGGREGATE on the
    line hash — NOT a row_number window: a window cannot split a hot
    key, and THE defining input here has one (a boilerplate line
    shared by 10^9 documents lands whole on one reducer). The
    aggregate partial-combines map-side (the hot key reduces to one
    row per task), and the join back on the hash is an equi-join AQE
    can skew-split. One more shuffle on doc_id reassembles. No
    self-join, no Python. Fully SQL-expressible → under the DuckDB
    hash gate."""
    lines = documents.select(
        "doc_id", F.posexplode(F.split("text", sep)).alias("idx", "ln")
    ).withColumn(
        "_h",
        F.when(F.length("ln") >= min_chars, F.md5("ln")).otherwise(
            # short lines get a per-position key: never deduped
            F.concat_ws(":", F.lit("keep"), F.col("doc_id"), F.col("idx"))
        ),
    )
    firsts = lines.groupBy("_h").agg(
        F.min(F.struct("doc_id", "idx")).alias("_first")
    )
    kept = lines.join(firsts, on="_h").withColumn(
        "_keep", F.struct("doc_id", "idx") == F.col("_first")
    )
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("idx", "ln"))
                    )
                ),
                lambda s: s["ln"],
            ),
            sep,
        ).alias("text"),
        F.count("*").alias("n_lines"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias("n_dropped"),
    )


def _stage_exists(path: str) -> bool:
    import os

    return os.path.exists(os.path.join(path, "_SUCCESS"))


def stage_corpus(documents: DataFrame, stage_dir: str, n: int = 3) -> str:
    """The single full-text scan behind ``dedupe_corpus(stage_dir=)``:
    write the compact (doc_id, md5(text), shingle-array) table —
    raw text dropped — that every downstream dedup stage reads.
    Factored out so the stage write and the downstream read can be
    run (and timed) independently; returns the table path."""
    # path keyed on the shingle size (r6 advice): a stage table
    # written with a different n must never be silently reused
    path = f"{stage_dir}/dedup_stage_n{n}.parquet"
    fanout_small(documents).select(
        "doc_id",
        F.md5("text").alias("_h"),
        shingles(F.col("text"), n).alias("_sh"),
    ).write.mode("overwrite").parquet(path)
    return path


def dedupe_corpus(
    documents: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "md5",
    max_bucket: int | None = None,
    algorithm: str = "minlabel",
    stage_dir: str | None = None,
    stage_reuse: bool = False,
) -> DataFrame:
    """One-call training-corpus dedup: exact + near-dup in a single
    labeled table → (doc_id, keep_id, is_exact_dup, component,
    is_canonical).

    Composition of the verified primitives: exact hash-groupBy,
    shuffle-free MinHash signatures → banded LSH candidates →
    exact-Jaccard verify at ``threshold`` → connected components →
    min-id canonical per cluster. The row a pipeline KEEPS is
    ``is_canonical`` (exactly one per near-dup cluster; singletons
    are their own cluster). ``max_bucket``/``algorithm`` are the
    planet-scale levers: the cap is applied in ``lsh_candidate_pairs``
    before the bucket self-join (logged, never silent), the star
    contraction bounds clustering at O(log n) rounds.

    ``stage_dir``: the SINGLE-SCAN lever. The default lazy DAG scans
    ``documents`` and re-runs the tokenize+shingle expression ~4×
    (exact keying, signatures, both sides of the Jaccard verify) —
    free at test scale, 3 redundant full-text passes at 100 TB. With
    ``stage_dir`` set, one pass writes the compact
    (doc_id, md5(text), shingle-array) table to
    ``<stage_dir>/dedup_stage_n{n}.parquet`` (the raw text column
    DROPPED) and every downstream stage reads that columnar table
    instead. Results are identical (pytest-pinned).

    ``stage_reuse``: resumability — when the stage table already
    exists (``_SUCCESS`` present), read it instead of rewriting. A
    restarted 100 TB dedup job skips its most expensive pass; it is
    also how the bench times the stage write and the downstream read
    as separate walls."""
    if stage_dir is not None:
        spark = documents.sparkSession
        path = f"{stage_dir}/dedup_stage_n{n}.parquet"
        if not (stage_reuse and _stage_exists(path)):
            stage_corpus(documents, stage_dir, n=n)
        staged = spark.read.parquet(path)
        exact = _exact_from_keyed(
            staged.select("doc_id", F.col("_h").alias("h"))
        ).select("doc_id", "keep_id", F.col("is_dup").alias("is_exact_dup"))
        verified = minhash_dedup(
            documents, num_hashes, bands, n, threshold, hash_fn,
            max_bucket=max_bucket,
            shingled=staged.select("doc_id", "_sh"),
        ).select("doc_a", "doc_b")
        clusters = dedup_clusters_from_pairs(
            staged.select("doc_id"), verified, algorithm=algorithm
        )
        return exact.join(clusters, on="doc_id")
    # Lazy path (r7): same single-scan shape as the staged path, but
    # materialized with an eager localCheckpoint instead of a durable
    # parquet table. The old form re-ran the tokenize+shingle
    # expression ~4x (exact keying, signatures, both Jaccard-verify
    # sides) — measured 4.8 -> 3.1 s at sf0.1 (interleaved A/B); the
    # checkpoint is paid on EVERY invocation (nothing survives the
    # call), and `stage_dir` remains the durable/resumable variant
    # for clusters where executor-local blocks are not enough.
    st = (
        fanout_small(documents)
        .select(
            "doc_id",
            F.md5("text").alias("_h"),
            shingles(F.col("text"), n).alias("_sh"),
        )
        .localCheckpoint(eager=True)
    )
    exact = _exact_from_keyed(
        st.select("doc_id", F.col("_h").alias("h"))
    ).select("doc_id", "keep_id", F.col("is_dup").alias("is_exact_dup"))
    verified = minhash_dedup(
        documents, num_hashes, bands, n, threshold, hash_fn,
        max_bucket=max_bucket,
        shingled=st.select("doc_id", "_sh"),
    ).select("doc_a", "doc_b")
    clusters = dedup_clusters_from_pairs(
        st.select("doc_id"), verified, algorithm=algorithm
    )
    return exact.join(clusters, on="doc_id")


def dedup_clusters_from_pairs(
    documents: DataFrame,
    pairs: DataFrame,
    algorithm: str = "minlabel",
) -> DataFrame:
    """dedup_clusters with an explicit CC algorithm choice."""
    comp = connected_components(pairs, algorithm=algorithm)
    return (
        documents.select("doc_id")
        .join(comp, documents.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("component"))
    )


def dedup_clusters(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """→ (doc_id, component, is_canonical): every document labeled
    with its near-dup cluster (singletons are their own component);
    the min doc_id per cluster is canonical — the row a training-data
    pipeline keeps."""
    comp = connected_components(pairs)
    return (
        documents.select("doc_id")
        .join(comp, documents.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
        .withColumn(
            "is_canonical", (F.col("doc_id") == F.col("component"))
        )
    )


def dedupe_increment(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    threshold: float = 0.3,
    max_bucket: int | None = None,
    corpus_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental corpus update — screen a NEW batch against an
    EXISTING corpus → one row per new doc:
    (doc_id, exact_dup, near_dup, keep = neither).

    The daily-crawl shape of `dedupe_corpus`: intra-batch dedup is
    that operator's job; this one answers "which new docs are
    (near-)copies of what we already have". doc_ids must be unique
    ACROSS both frames (they share the verification join keyspace).

    Scale shape:
    - exact: md5(text) LEFT SEMI join — shuffle on the 32-char
      digest, never the text (same as exact_dedup).
    - near: shuffle-free MinHash signatures on both sides, the ONE
      shared `band_buckets` definition (so a corpus bucket table
      precomputed for `streaming_near_dup_flags` is byte-compatible
      here — pass it via `corpus_sigs`' banding), a (band, bh)
      equi-join new×corpus (NOT a self-join: candidate growth is
      |new|-bounded), `max_bucket` capping the CORPUS side's hot
      buckets, then exact-Jaccard verification over the candidates
      only.
    - In production the corpus signatures are precomputed once
      (`corpus_sigs=`) and reused across every increment — the
      corpus is only ever re-read for the Jaccard verify of actual
      candidates."""
    new_ids = new_docs.select("doc_id")
    corpus_md5 = corpus_docs.select(F.md5("text").alias("_md5")).distinct()
    exact = (
        new_docs.select("doc_id", F.md5("text").alias("_md5"))
        .join(corpus_md5, "_md5", "left_semi")
        .select("doc_id")
        .withColumn("exact_dup", F.lit(True))
    )
    sig_new = minhash_signatures(new_docs, num_hashes, n)
    sig_c = (
        corpus_sigs
        if corpus_sigs is not None
        else minhash_signatures(corpus_docs, num_hashes, n)
    )
    bk_new = band_buckets(sig_new, num_hashes, bands, id_out="doc_a")
    bk_c = band_buckets(sig_c, num_hashes, bands, id_out="doc_b")
    bk_c = _cap_buckets(bk_c, ["band", "bh"], max_bucket, "dedupe_increment")
    cands = (
        bk_new.join(bk_c, ["band", "bh"]).select("doc_a", "doc_b").distinct()
    )
    # the Jaccard verify only needs shingles for docs that are
    # actually candidates, and the candidate set is |new|-bounded —
    # so LEFT SEMI the corpus on cands.doc_b BEFORE the shingle
    # explode (r5 verdict item 6: the old full-corpus explode was
    # correct but corpus-bounded at 100 TB). The candidate subplan
    # appears twice (semi filter + verify pairs); its shuffles
    # dedupe via ReusedExchange (PLANS.md-audited).
    corpus_cand = corpus_docs.join(
        cands.select(F.col("doc_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    # array-based verify (see _verify_jaccard_arrays): shingle ARRAYS
    # per side, no shingle-level explode/joins. corpus_cand is
    # join-derived (already shuffle-parallel) and must not be probed
    # by fanout_small, so only the new side gets the parallelism floor
    shing = (
        fanout_small(new_docs)
        .select("doc_id", shingles(F.col("text"), n).alias("_sh"))
        .unionByName(
            corpus_cand.select(
                "doc_id", shingles(F.col("text"), n).alias("_sh")
            )
        )
    )
    near = (
        _verify_jaccard_arrays(cands, shing, threshold)
        .select("doc_a")
        .distinct()
        .withColumnRenamed("doc_a", "doc_id")
        .withColumn("near_dup", F.lit(True))
    )
    return (
        new_ids.join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
            F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
            (
                ~F.coalesce("exact_dup", F.lit(False))
                & ~F.coalesce("near_dup", F.lit(False))
            ).alias("keep"),
        )
    )


def winnow_fingerprints(
    documents: DataFrame,
    k: int = 16,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
    chunk_chars: int | None = 4096,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the public MOSS algorithm) → distinct (doc_id, fp) rows.

    Hash every k-char gram of the normalized text (lowercase,
    whitespace-collapsed), slide a window of w consecutive hashes,
    and keep each window's MINIMUM — the winnowing guarantee: two
    documents sharing ANY substring of length ≥ w + k - 1 chars
    share at least one fingerprint. This is the character-level
    complement to shingle MinHash: MinHash measures whole-document
    set overlap; winnowing catches a single long verbatim run (a
    quoted paragraph, boilerplate block) inside otherwise-different
    documents.

    Pure per-row column math — THREE projections: the normalized
    text, the hash array, then the window minima. The normalization
    gets its own projection because Spark does not
    common-subexpression-eliminate inside HOF lambdas: inlining
    lower(regexp_replace(...)) into the k-gram transform re-ran the
    regex once per position — measured 42.8 s → ~2 s at sf0.1.
    md5 keeps DuckDB parity (hex min ≡ 128-bit integer min). We keep
    the distinct min-VALUE-per-window form (not the positional
    rightmost-min variant): the ≥ w+k-1 guarantee only needs equal
    windows to pick equal values, and a value set is
    engine-order-independent. Documents shorter than w+k-1
    normalized chars have no window and drop out.

    ``chunk_chars`` bounds PER-ROW memory (r5 verdict item 5): the
    hash array is O(|text|) per row — ~3 MB on a 100 KB doc in the
    md5-hex form — so long texts are exploded into ``chunk_chars``
    slices overlapping by w+k-2 chars before hashing. Every hash
    window of the unchunked text lies fully inside some chunk (the
    overlap spans all but one char of a window), and equal windows
    pick equal minima, so the fingerprint SET is IDENTICAL to the
    unchunked form (property-pytested); duplicate fps from overlap
    regions are dropped by a final distinct. ``None`` = unchunked
    (single projection, no explode/distinct — fine when doc length
    is known-bounded)."""
    span = k + w - 1  # chars covered by one hash window
    documents = fanout_small(documents)
    norm = documents.select(
        F.col(id_col).alias("doc_id"),
        F.lower(
            F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
        ).alias("_t"),
    ).filter(F.length("_t") >= span)
    t = F.col("_t")
    if chunk_chars is not None:
        if chunk_chars < 2 * span:
            raise ValueError(
                f"chunk_chars={chunk_chars} must be >= 2*(k+w-1)={2 * span}"
            )
        # chunk starts: every global window start position must be a
        # valid in-chunk start, so the stride is chunk_chars-(span-1)
        starts = F.sequence(
            F.lit(1), F.length(t) - span + 1, F.lit(chunk_chars - span + 1)
        )
        norm = norm.select(
            "doc_id", "_t", F.explode(starts).alias("_s")
        ).select(
            "doc_id", F.substring(t, F.col("_s"), chunk_chars).alias("_t")
        )
    if hash_fn == "md5":
        gram_hash = lambda i: F.md5(F.substring(t, i, k))  # noqa: E731
    elif hash_fn == "xxhash64":
        # production path (minhash precedent): native int64 hashes,
        # integer window minima — no 32-char hex strings to allocate
        # and compare; DuckDB parity not needed/possible here
        gram_hash = lambda i: F.xxhash64(F.substring(t, i, k))  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    hashes = F.transform(
        F.sequence(F.lit(1), F.length(t) - k + 1), gram_hash
    )
    base = norm.select("doc_id", hashes.alias("_hs"))
    # Sliding-window minima via a sparse table (doubling): build
    # m_{2p}[j] = min(m_p[j], m_p[j+p]) for p = 1,2,4,... up to the
    # largest power of two P <= w, then window_min_w[j] =
    # min(m_P[j], m_P[j+w-P]) — the two P-windows overlap and cover
    # [j, j+w-1] exactly (w <= 2P), and min is idempotent, so the
    # values are IDENTICAL to the previous array_min(slice(hs, j, w))
    # form (property-pytested). O(L·log w) comparisons instead of
    # O(L·w) slice+scan — measured ~2x on the 32-char md5-hex path
    # where every comparison is a string compare (guide §1.2 "per-task
    # work"). One chained projection per level: CollapseProject will
    # not re-inline non-cheap expressions referenced twice, so each
    # level is evaluated once.
    big = 1 << (w.bit_length() - 1)  # largest power of two <= w
    lvl = base.select("doc_id", F.col("_hs").alias("_m"))

    def _pair_min(col: str, d: int):
        n_out = F.size(col) - d
        return F.zip_with(
            F.slice(col, 1, n_out),
            F.slice(col, d + 1, n_out),
            lambda l, r: F.least(l, r),
        )

    p = 1
    while p < big:
        lvl = lvl.select("doc_id", _pair_min("_m", p).alias("_m"))
        p *= 2
    if w > big:
        lvl = lvl.select("doc_id", _pair_min("_m", w - big).alias("_m"))
    out = lvl.select(
        "doc_id", F.explode(F.array_distinct("_m")).alias("fp")
    )
    if chunk_chars is not None:
        # overlap regions emit the same fp from two chunks
        out = out.distinct()
    return out


def winnow_pairs(
    documents: DataFrame,
    k: int = 16,
    w: int = 8,
    max_bucket: int | None = None,
    hash_fn: str = "md5",
    chunk_chars: int | None = 4096,
    stage_dir: str | None = None,
) -> DataFrame:
    """Distinct (doc_a, doc_b) document pairs sharing ≥1 winnowing
    fingerprint — i.e. guaranteed to surface every pair sharing a
    verbatim run of ≥ w+k-1 chars. Equi-join on the fingerprint
    (never all-pairs); `max_bucket` drops degenerate boilerplate
    fingerprints shared by half the corpus (logged, see
    _cap_buckets) — None is the exact/oracle configuration.

    ``stage_dir``: the self-join's two sides otherwise each evaluate
    the full text-hashing pipeline (Catalyst cannot reuse the
    exchange once one side broadcasts). At 100 TB stage the compact
    (doc_id, fp) table to parquet once — MOSS's own fingerprint
    index — and both sides read it; identical results."""
    fps = winnow_fingerprints(
        documents, k, w, hash_fn=hash_fn, chunk_chars=chunk_chars
    )
    if stage_dir is not None:
        path = f"{stage_dir}/winnow_fps.parquet"
        fps.write.mode("overwrite").parquet(path)
        fps = documents.sparkSession.read.parquet(path)
    else:
        # materialize the compact (doc_id, fp) table once per
        # invocation (eager — nothing survives the call): both join
        # sides otherwise re-run the whole text-hashing pipeline
        # (r7; the durable variant stays ``stage_dir``)
        fps = fps.localCheckpoint(eager=True)
    fps = _cap_buckets(fps, ["fp"], max_bucket, "winnow_pairs")
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.fp") == F.col("b.fp"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
