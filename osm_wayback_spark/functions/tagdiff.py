"""W1 — tag diff as native Catalyst expressions (zero Python).

Reference semantics (add_history.cpp:118-204, HISTORICAL_SCHEMA.md:96-121):

- first found version → ALL tags emitted as ``aA``;
- equal maps → no diff members at all (add_history.cpp:139-141);
- otherwise: new keys → ``aA``, changed values → ``aM: {k: [prev, new]}``,
  removed keys → ``aD`` — each member only when non-empty;
- the diff is against the **previous successfully-found version**, not
  version−1 arithmetically (add_history.cpp:92,130,140): version gaps
  collapse. ``lag`` over the *found* rows reproduces this exactly.

Implemented with ``lag`` + map higher-order functions so the whole
thing stays inside whole-stage codegen; the window shuffle on
(element_type, id) is shared with the downstream history-join/groupBy
on the same keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _nullify_empty(m: Column) -> Column:
    return F.when(F.size(m) > 0, m)


def tag_diff_columns(cur: Column, prev: Column) -> dict[str, Column]:
    """aA/aM/aD columns given current and previous tag maps."""
    added = F.map_filter(cur, lambda k, _v: ~F.map_contains_key(prev, k))
    deleted = F.map_filter(prev, lambda k, _v: ~F.map_contains_key(cur, k))
    modified = F.map_filter(
        F.map_zip_with(prev, cur, lambda _k, p, c: F.array(p, c)),
        lambda _k, pc: pc[0].isNotNull() & pc[1].isNotNull() & (pc[0] != pc[1]),
    )
    first_version = prev.isNull()
    return {
        # First found version: all tags are aA — even an empty map is
        # still attached (the reference writes the member for v1).
        "aA": F.when(first_version, cur).otherwise(_nullify_empty(added)),
        "aM": F.when(first_version, F.lit(None)).otherwise(_nullify_empty(modified)),
        "aD": F.when(first_version, F.lit(None)).otherwise(_nullify_empty(deleted)),
    }


def with_tag_diff(versions: DataFrame) -> DataFrame:
    """Append aA/aM/aD per version row. One window shuffle on
    (element_type, id) — reused by every downstream op keyed the same.
    """
    w = Window.partitionBy("element_type", "id").orderBy("version")
    # Materialize the lag ONCE so the plan carries a single Window
    # operator, then derive the three diff maps from it.
    staged = versions.withColumn("_prev_tags", F.lag("tags").over(w))
    cols = tag_diff_columns(F.col("tags"), F.col("_prev_tags"))
    return staged.select(
        *versions.columns, *[c.alias(n) for n, c in cols.items()]
    )


def fold_tags(history_col: Column) -> Column:
    """F5 — running tag reconstruction (inverse of the diff): fold
    aA/aM/aD over a version-ascending history array to the full tag
    state of the last entry (map-geom-reconstruction.js:11-28).

    Native ``aggregate`` over the array: apply adds, take aM[k][1],
    drop aD keys.
    """
    def step(acc: Column, rec: Column) -> Column:
        with_adds = F.map_concat(
            F.map_filter(acc, lambda k, _v: ~F.map_contains_key(
                F.coalesce(rec["aA"], F.create_map()), k)),
            F.coalesce(rec["aA"], F.create_map()),
        )
        mods = F.transform_values(
            F.coalesce(rec["aM"], F.create_map().cast("map<string,array<string>>")),
            lambda _k, v: v[1],
        )
        with_mods = F.map_concat(
            F.map_filter(with_adds, lambda k, _v: ~F.map_contains_key(mods, k)),
            mods,
        )
        return F.map_filter(
            with_mods,
            lambda k, _v: ~F.map_contains_key(
                F.coalesce(rec["aD"], F.create_map()), k
            ),
        )

    init = F.create_map().cast("map<string,string>")
    return F.aggregate(history_col, init, step)
