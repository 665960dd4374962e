"""Frequent-items top-k serving over the events table — the op-level
wrapper around ``core/freqitems.py`` (mergeable per-day top-k' partials,
served per month with provable bounds). The oracle inlines the SAME
build+serve algorithm in ANSI SQL (exact integer arithmetic throughout),
so the comparison is bit-exact, driver-contract grade.

The 100 TB shape this models: a day-partitioned rollup stores the
``freq_items`` struct per day, and "top user_ids over any date range"
is served from the partials alone — no raw re-scan, cost ∝ days
touched × k'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.freqitems import freq_items_partial, freq_topk_serve
from .common import load_table, scoped_cache

#: build/serve parameters of the contract entry — k' is deliberately
#: SMALLER than the per-day user cardinality at test scale so the
#: residual-bound path (count_lb < count_ub, unguaranteed items) is
#: actually exercised by the hash check
FREQ_OP_KPRIME = 8
FREQ_OP_K = 5


def freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # week groups, not month: the synthetic events table spans a single
    # month, so weekly serving exercises several merge groups
    ev = (load_table(spark, sf_dir, "events")
          .withColumn("dt", F.to_date("ts"))
          .withColumn("week", F.date_format(F.date_trunc("week", "ts"),
                                            "yyyy-MM-dd")))
    # the serve consumes the partials on three branches (items / caps /
    # threat); in production they are a STORED rollup table — here the
    # inline build is scope-cached so it runs once, not three times
    parts = scoped_cache(freq_items_partial(ev, ["dt", "week"], "user_id",
                                            k=FREQ_OP_KPRIME))
    return freq_topk_serve(parts, ["week"], k=FREQ_OP_K)


def freq_topk_oracle() -> str:
    kp, k = FREQ_OP_KPRIME, FREQ_OP_K
    return f"""
WITH counts AS (
    SELECT CAST(ts AS DATE) AS dt,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           CAST(user_id AS VARCHAR) AS v, COUNT(*) AS c
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1, 2, 3
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY dt, week
                                 ORDER BY c DESC, v ASC) AS r
    FROM counts
), part_om AS (      -- per-day residual: max dropped count
    SELECT dt, week,
           COALESCE(MAX(CASE WHEN r > {kp} THEN c END), 0) AS om
    FROM ranked GROUP BY dt, week
), caps AS (
    SELECT week, SUM(om) AS om_all FROM part_om GROUP BY week
), items AS (        -- stored entries only (rank <= k'), with the
                     -- residual of the partials that stored each value
    SELECT ranked.week, v, SUM(c) AS count_lb, SUM(om) AS om_present
    FROM ranked JOIN part_om USING (dt, week)
    WHERE r <= {kp}
    GROUP BY ranked.week, v
), scored AS (
    SELECT items.*, caps.om_all,
           count_lb + om_all - om_present AS count_ub,
           ROW_NUMBER() OVER (PARTITION BY items.week
                              ORDER BY count_lb DESC, v ASC) AS rank
    FROM items JOIN caps USING (week)
), threat AS (
    SELECT week, COALESCE(MAX(CASE WHEN rank > {k} THEN count_ub END), 0)
           AS dropped_ub
    FROM scored GROUP BY week
)
SELECT week, v AS value,
       CAST(count_lb AS BIGINT) AS count_lb,
       CAST(count_ub AS BIGINT) AS count_ub, rank,
       count_lb >= GREATEST(dropped_ub, om_all) AS guaranteed
FROM scored JOIN threat USING (week)
WHERE rank <= {k}
ORDER BY week, rank
"""
