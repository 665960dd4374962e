"""Mergeable frequent-items (top-k) partials — the Druid DataSketches
``frequentItems`` rollup-column shape re-expressed Spark-first, following
the histogram/HLL partial precedent in ``core/rollup.py``.

A pre-aggregated table stores, per grain row, the EXACT counts of the
grain's ``FREQ_K`` heaviest values plus two residual scalars (the total
and the maximum of every dropped value's count). Serving "top-k user_ids
over any day range" then needs only the stored partials — no raw re-scan
— and each reported item carries a deterministic [lower, upper] count
bound plus a ``guaranteed`` flag saying the item is PROVABLY in the true
top-k. This is the classical mergeable-summary argument (Misra-Gries /
SpaceSaving merge theory; Agarwal et al., "Mergeable Summaries", PODS'12):

* within one grain row the stored counts are exact (the build groups
  exactly, then keeps the top ``k'``), so a value's true count over a
  set of grain rows is ``stored_sum <= true <= stored_sum +
  sum(others_max of the rows where it was dropped)``;
* a value never stored anywhere is bounded by ``sum(others_max)``;
* an item is guaranteed top-k when its lower bound beats the best upper
  bound any non-reported value could reach.

Why not a single ``Rollup.agg`` expression like HllSketchRollup: an exact
per-group top-k' needs a rank, which is a window over the grouped counts,
not one aggregate. The build is therefore a two-step DataFrame function
(groupBy with map-side combine, then one window at the grain) — the same
altitude as the materializer's other build steps, and strictly cheaper
than a grouped-agg pandas UDF, which would shuffle raw values with no
partial aggregation.

At 100 TB: the build shuffles (grain, value) partial counts — map-side
combined, state per task bounded by distinct values per partition; the
window sorts within each grain row's counts. Serving explodes stored maps
(≤ k' entries per partial) and re-groups — cost ∝ partials touched, never
raw rows. Beyond-reference operator (maha exposes no frequent-items
aggregator; Druid serves this via datasketches extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: stored candidates per partial (k'): serve-time guarantees hold for any
#: requested k <= FREQ_K; producers must agree, like HLL_LG_K / HIST_BINS
FREQ_K = 32


def freq_items_partial(df: DataFrame, grain_cols: list[str],
                       value_col: str, k: int = FREQ_K,
                       out_col: str = "freq_items") -> DataFrame:
    """One partial per grain row: ``struct(items map<string,bigint>,
    others_total bigint, others_max bigint, total bigint)``.

    ``items`` holds the grain's top-``k`` values by exact count
    (ties broken by value ascending — deterministic across engines);
    ``others_total``/``others_max`` summarize the dropped tail; NULL
    values are excluded (count them separately if needed, as the zone
    maps do with null_count)."""
    counts = (df.filter(F.col(value_col).isNotNull())
              .groupBy(*grain_cols,
                       F.col(value_col).cast("string").alias("_v"))
              .agg(F.count(F.lit(1)).alias("_c")))
    w = (Window.partitionBy(*grain_cols)
         .orderBy(F.desc("_c"), F.asc("_v")))
    ranked = counts.withColumn("_r", F.row_number().over(w))
    kept = F.when(F.col("_r") <= k, F.struct(F.col("_v").alias("key"),
                                             F.col("_c").alias("value")))
    return (ranked.groupBy(*grain_cols)
            .agg(F.map_from_entries(
                     # collect_list drops the NULLs the `when` leaves for
                     # beyond-k ranks; sort_array makes the stored entry
                     # order deterministic (maps compare by content, but
                     # a stable on-disk form keeps file diffs meaningful)
                     F.sort_array(F.collect_list(kept))).alias("_items"),
                 F.sum(F.when(F.col("_r") > k, F.col("_c"))
                       .otherwise(F.lit(0)).cast("bigint"))
                 .alias("_ot"),
                 F.coalesce(F.max(F.when(F.col("_r") > k, F.col("_c"))),
                            F.lit(0)).cast("bigint").alias("_om"),
                 F.sum("_c").cast("bigint").alias("_tot"))
            .select(*grain_cols,
                    F.struct(F.col("_items").alias("items"),
                             F.col("_ot").alias("others_total"),
                             F.col("_om").alias("others_max"),
                             F.col("_tot").alias("total"))
                    .alias(out_col)))


def freq_topk_serve(partials: DataFrame, group_cols: list[str], k: int,
                    partial_col: str = "freq_items") -> DataFrame:
    """Approximate top-``k`` per ``group_cols`` from stored partials.

    Returns one row per reported item: group cols + ``value``,
    ``count_lb`` (sum of stored exact counts — a certain lower bound),
    ``count_ub`` (lower bound plus the residual capacity of every
    partial that did NOT store the value), ``rank`` (by ``count_lb``
    desc, value asc), ``guaranteed`` (TRUE when the item provably
    belongs to A valid top-k: its certain lower bound is >= the largest
    upper bound any non-reported value could attain — an exact tie
    means the outside value can at most EQUAL it, so membership holds
    under some tie-breaking). Only non-reported values can push a
    reported item out of the top-k (the other k-1 reported items
    cannot), so the per-item threat is max(best dropped upper bound,
    the full residual capacity that bounds every never-stored value).
    The bounds are valid for ANY requested k — k > the build's k' just
    yields weaker guarantees, never wrong ones.

    The whole computation is exact integer arithmetic over the partials
    — a SQL twin reproduces it bit-for-bit (test-pinned)."""
    reserved = {"value", "count_lb", "count_ub", "rank", "guaranteed",
                "_v", "_c", "_om", "_om_all", "_om_present",
                "_dropped_ub", "_items"}
    clash = reserved & set(group_cols)
    if clash:
        raise ValueError(
            f"freq_topk_serve: group column(s) {sorted(clash)} collide "
            "with the serve's output/internal names — rename before "
            "serving")
    gc = [F.col(c) for c in group_cols]
    p = partials.select(
        *group_cols,
        F.col(f"{partial_col}.items").alias("_items"),
        F.col(f"{partial_col}.others_max").alias("_om"))
    # per-group residual capacity (the never-stored-value bound)
    caps = (p.groupBy(*group_cols)
            .agg(F.sum("_om").alias("_om_all")))
    # per (group, value): lower bound + residual of the partials that
    # stored the value (their capacity cannot also hide it)
    items = (p.select(*group_cols, F.col("_om"),
                      F.explode("_items").alias("_v", "_c"))
             .groupBy(*group_cols, "_v")
             .agg(F.sum("_c").alias("count_lb"),
                  F.sum("_om").alias("_om_present")))
    scored = (items.join(caps, group_cols)
              .withColumn("count_ub",
                          F.col("count_lb") + F.col("_om_all")
                          - F.col("_om_present")))
    w = (Window.partitionBy(*group_cols)
         .orderBy(F.desc("count_lb"), F.asc("_v")))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    # the adversary's best case: the largest upper bound among values we
    # will NOT report — either a stored-but-outranked value, or a value
    # never stored anywhere (bounded by the full residual capacity).
    # Computed as a SECOND window over the same group partitioning
    # (whole-partition frame), not a groupBy + self-join: the old shape
    # consumed `ranked` twice — the un-cached explode/agg/join/sort
    # subtree ran once per consumer — and added an aggregation exchange
    # plus a join for a per-group scalar the rank window's partitions
    # already hold (r12, guide §2.4: operations keyed the same way
    # share one exchange; same values bit-for-bit — max/when/coalesce
    # over identical rows).
    wg = Window.partitionBy(*group_cols)
    out = (ranked.withColumn(
               "_dropped_ub",
               F.coalesce(
                   F.max(F.when(F.col("rank") > k,
                                F.col("count_ub"))).over(wg),
                   F.lit(0)))
           .filter(F.col("rank") <= k)
           .withColumn("guaranteed",
                       F.col("count_lb") >=
                       F.greatest(F.col("_dropped_ub"),
                                  F.col("_om_all"))))
    return (out.select(*group_cols, F.col("_v").alias("value"),
                       "count_lb", "count_ub", "rank", "guaranteed")
            .orderBy(*gc, "rank"))


def freq_topk_serve_sql(partials_table: str, group_cols: list[str],
                        k: int, partial_col: str = "freq_items") -> str:
    """ANSI-SQL twin of ``freq_topk_serve`` over the same stored
    partials (DuckDB spelling: map entries via ``map_entries``) — the
    serve algorithm is exact integer arithmetic, so engines agree
    bit-for-bit. Used by the oracle pins."""
    g = ", ".join(group_cols)
    return f"""
WITH p AS (
    SELECT {g}, {partial_col}.others_max AS om,
           unnest(map_entries({partial_col}.items)) AS e
    FROM {partials_table}
), caps AS (
    SELECT {g}, SUM({partial_col}.others_max) AS om_all
    FROM {partials_table} GROUP BY {g}
), items AS (
    SELECT {g}, e.key AS v, SUM(e.value) AS count_lb,
           SUM(om) AS om_present
    FROM p GROUP BY {g}, e.key
), scored AS (
    SELECT items.*, caps.om_all,
           count_lb + om_all - om_present AS count_ub,
           ROW_NUMBER() OVER (PARTITION BY {g}
                              ORDER BY count_lb DESC, v ASC) AS rank
    FROM items JOIN caps USING ({g})
), threat AS (
    SELECT {g}, COALESCE(MAX(CASE WHEN rank > {k} THEN count_ub END), 0)
           AS dropped_ub
    FROM scored GROUP BY {g}
)
SELECT {g}, v AS value,
       CAST(count_lb AS BIGINT) AS count_lb,
       CAST(count_ub AS BIGINT) AS count_ub, rank,
       count_lb >= GREATEST(dropped_ub, om_all) AS guaranteed
FROM scored JOIN threat USING ({g})
WHERE rank <= {k}
ORDER BY {g}, rank
"""


def merge_freq_partials(partials: DataFrame, grain_cols: list[str],
                        k: int = FREQ_K,
                        partial_col: str = "freq_items") -> DataFrame:
    """Collapse many partials per grain row into AT MOST TWO valid
    partials — the PODS'12 mergeable-summary MERGE, used as the
    compaction job for streaming-appended partial tables (one partial
    lands per micro-batch; serve cost grows with partial count until
    this runs).

    Why two rows, not one: the serve's contract is that a partial's
    stored counts are EXACT over that partial's own data slice (it
    subtracts the partial's ``others_max`` from a stored value's upper
    bound). A merged kept count is only a LOWER bound — folding its
    deficit into a single row's ``others_max`` would be subtracted
    right back out for stored values, silently under-bounding (a real
    bug this replaced — caught by the bound-containment test). Instead
    the merge PARTITIONS the data:

    * the **kept row** holds the top-``k`` values by summed stored
      counts (ties by value) with ``others_max = others_total = 0`` —
      a valid exact partial over exactly the occurrences those sums
      counted;
    * the **residual row** (omitted when empty) holds no items and
      carries ALL hidden mass: kept values' deficits (each <=
      sum(input others_max)), dropped stored values (each <= the max
      dropped sum + sum(input others_max)), and never-stored values
      (<= sum(input others_max)) — so its ``others_max =
      max_dropped_sum + sum(input others_max)`` bounds every value of
      its slice, and its total/others_total is the input total mass
      minus the kept sums.

    Both rows are genuine partials of disjoint slices of the original
    data, so the serve needs no new assumptions. When every input
    partial stored ALL its values and ``k`` covers the merged distinct
    count, the residual slice is empty and the single output row ==
    the one-shot ``freq_items_partial`` of the unioned raw data,
    bit-for-bit (test-pinned). Otherwise bounds only widen — never
    wrong, only looser — the documented trade of compacting lossy
    summaries."""
    p = partials.select(
        *grain_cols,
        F.col(f"{partial_col}.items").alias("_items"),
        F.col(f"{partial_col}.others_max").alias("_om"),
        F.col(f"{partial_col}.total").alias("_tot"))
    sums = (p.groupBy(*grain_cols)
            .agg(F.sum("_om").cast("bigint").alias("_om_sum"),
                 F.sum("_tot").cast("bigint").alias("_tot_sum")))
    counts = (p.select(*grain_cols, F.explode("_items").alias("_v", "_c"))
              .groupBy(*grain_cols, "_v")
              .agg(F.sum("_c").alias("_c")))
    w = (Window.partitionBy(*grain_cols)
         .orderBy(F.desc("_c"), F.asc("_v")))
    ranked = counts.withColumn("_r", F.row_number().over(w))
    kept = F.when(F.col("_r") <= k, F.struct(F.col("_v").alias("key"),
                                             F.col("_c").alias("value")))
    agg = (ranked.groupBy(*grain_cols)
           .agg(F.map_from_entries(
                    F.sort_array(F.collect_list(kept))).alias("_items"),
                F.sum(F.when(F.col("_r") <= k, F.col("_c"))
                      .otherwise(F.lit(0))).cast("bigint").alias("_kept"),
                F.coalesce(F.max(F.when(F.col("_r") > k, F.col("_c"))),
                           F.lit(0)).cast("bigint").alias("_dmax")))
    # join FROM sums (left): a grain whose input partials all carry empty
    # items maps yields no explode rows and is absent from `agg` — an
    # inner join would silently drop its others_total/others_max mass.
    # Unreachable from the repo's builders (a kept row is never empty),
    # but the merge must be total-preserving for ANY structurally valid
    # partial input, so coalesce the missing kept-side columns to
    # empty/0 and let the residual row carry all of that grain's mass.
    both = (sums.join(agg, grain_cols, "left")
            .withColumn("_items", F.coalesce(
                F.col("_items"),
                F.expr("CAST(map() AS map<string,bigint>)")))
            .withColumn("_kept", F.coalesce(F.col("_kept"),
                                            F.lit(0).cast("bigint")))
            .withColumn("_dmax", F.coalesce(F.col("_dmax"),
                                            F.lit(0).cast("bigint"))))
    kept_row = (both
                .filter(F.size(F.col("_items")) > 0)
                .select(
                    *grain_cols,
                    F.struct(F.col("_items").alias("items"),
                             F.lit(0).cast("bigint").alias("others_total"),
                             F.lit(0).cast("bigint").alias("others_max"),
                             F.col("_kept").alias("total"))
                    .alias(partial_col)))
    resid = (F.col("_tot_sum") - F.col("_kept")).cast("bigint")
    resid_row = (both
                 .withColumn("_resid", resid)
                 .filter(F.col("_resid") > 0)
                 .select(
                     *grain_cols,
                     F.struct(
                         F.map_from_entries(F.expr(
                             "CAST(array() AS "
                             "array<struct<key:string,value:bigint>>)"))
                         .alias("items"),
                         F.col("_resid").alias("others_total"),
                         (F.col("_dmax") + F.col("_om_sum"))
                         .cast("bigint").alias("others_max"),
                         F.col("_resid").alias("total"))
                     .alias(partial_col)))
    return kept_row.unionByName(resid_row)
