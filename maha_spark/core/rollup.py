"""Rollup (aggregation) expressions.

Mirrors the reference inventory (maha `core/.../fact/RollupExpression.scala:29-93`)
as Spark aggregate builders. Every rollup knows how to:

* ``agg(col)``      - aggregate a physical column at the fact grain
* ``reagg(col)``    - re-aggregate an already-aggregated column at an outer
                      group-by level (SURVEY §2.4 OGB). Sum-of-sums,
                      max-of-maxes; Average must NOT be averaged again
                      (avg re-agg is handled by keeping sum+count pairs);
                      Noop must not be re-aggregated at all.

CustomRollup (ratio metrics like SUM(spend)/SUM(clicks)) is intentionally
NOT a rollup here: it is a post-aggregation derived expression over other
aggregates (see columns.DerivedFactCol), which guarantees the
"aggregate then divide, never average-of-averages" semantic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column, functions as F


@dataclass(frozen=True)
class Rollup:
    def agg(self, col: Column) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def reagg(self, col: Column) -> Column:
        """Default outer re-aggregation (used after a dim join widens grain)."""
        return self.agg(col)

    #: whether this rollup survives a second-level aggregation losslessly
    reaggregatable = True


@dataclass(frozen=True)
class SumRollup(Rollup):
    def agg(self, col: Column) -> Column:
        return F.sum(col)


@dataclass(frozen=True)
class MaxRollup(Rollup):
    def agg(self, col: Column) -> Column:
        return F.max(col)


@dataclass(frozen=True)
class MinRollup(Rollup):
    def agg(self, col: Column) -> Column:
        return F.min(col)


@dataclass(frozen=True)
class CountRollup(Rollup):
    """COUNT(*) regardless of the named column (RollupExpression.scala:33)."""

    def agg(self, col: Column) -> Column:
        return F.count(F.lit(1))

    def reagg(self, col: Column) -> Column:
        # count-of-rows re-aggregates as sum of partial counts
        return F.sum(col)


@dataclass(frozen=True)
class AverageRollup(Rollup):
    """AVG. Re-aggregation is NOT avg-of-avgs; the planner decomposes an
    average metric into sum+count partials when an outer group-by is
    required and recombines (plans/planner.py)."""

    reaggregatable = False

    def agg(self, col: Column) -> Column:
        return F.avg(col)

    def reagg(self, col: Column) -> Column:
        raise ValueError("AverageRollup cannot be re-aggregated directly; "
                         "planner must decompose into sum/count partials")


@dataclass(frozen=True)
class NoopRollup(Rollup):
    """Pass-through: value is not re-aggregated (RollupExpression.scala:34).
    At fact grain we surface an arbitrary (first) value; an outer group-by
    keeps first as well — mirrors the reference's 'do not re-aggregate'."""

    reaggregatable = False

    def agg(self, col: Column) -> Column:
        return F.first(col, ignorenulls=True)

    def reagg(self, col: Column) -> Column:
        return F.first(col, ignorenulls=True)


@dataclass(frozen=True)
class FilteredRollup(Rollup):
    """DruidFilteredRollup / DruidFilteredListRollup
    (RollupExpression.scala:71-82): aggregate only rows matching a
    condition -> F.sum(F.when(cond, col)).

    ``condition_sql`` is a Spark SQL boolean expression over physical fact
    columns; ``base`` is the inner aggregation (default sum).
    """

    condition_sql: str = "true"
    base: Rollup = field(default_factory=SumRollup)

    def agg(self, col: Column) -> Column:
        return self.base.agg(F.when(F.expr(self.condition_sql), col))

    def reagg(self, col: Column) -> Column:
        return self.base.reagg(col)


@dataclass(frozen=True)
class CardinalityRollup(Rollup):
    """DruidCardinalityRollup / DruidHyperUniqueRollup / ThetaSketch
    (RollupExpression.scala:83-93) -> approx_count_distinct (HLL++).
    ``exact=True`` gives countDistinct for oracle-verifiable paths."""

    rsd: float = 0.05
    exact: bool = False
    reaggregatable = False

    def agg(self, col: Column) -> Column:
        if self.exact:
            return F.count_distinct(col)
        return F.approx_count_distinct(col, self.rsd)

    def reagg(self, col: Column) -> Column:
        raise ValueError("cardinality cannot be re-aggregated from counts; "
                         "planner must aggregate at final grain directly")


#: default HLL precision shared by every sketch producer (registry
#: rollups, batch materializers, streaming ingest) — hll_union_agg
#: silently downgrades to the SMALLEST lgK it merges, so producers must
#: agree or accuracy quietly degrades
HLL_LG_K = 12


@dataclass(frozen=True)
class HllSketchRollup(Rollup):
    """Mergeable datasketches HLL partial (the Druid hyperUnique ROLLUP
    column: pre-aggregated tables store the sketch BYTES, not a count, so
    distinct estimates re-aggregate at ANY coarser grain — union takes
    the per-register max, so merged register state matches building from
    raw values; estimates are exact-identical while sketches stay in
    sparse mode and may differ by a few counts past it, where the direct
    build can use the HIP estimator the union drops — both stay within
    the sketch's error bound). ``agg`` builds the sketch from raw
    values; ``reagg`` (outer group-by over partials) unions."""

    lg_k: int = HLL_LG_K

    def agg(self, col: Column) -> Column:
        return F.hll_sketch_agg(col, self.lg_k)

    def reagg(self, col: Column) -> Column:
        return F.hll_union_agg(col, True)


@dataclass(frozen=True)
class HllUnionRollup(Rollup):
    """Re-aggregation side of ``HllSketchRollup``: a table storing sketch
    partials merges them with union at any requested grain."""

    def agg(self, col: Column) -> Column:
        return F.hll_union_agg(col, True)


@dataclass(frozen=True)
class RoundedSumRollup(Rollup):
    """RoundingDoubleSumAggregatorFactory (druid-lookups .../RoundingDoubleSumAggregatorFactory.java)."""

    scale: int = 2

    def agg(self, col: Column) -> Column:
        return F.round(F.sum(col), self.scale)

    def reagg(self, col: Column) -> Column:
        return F.round(F.sum(col), self.scale)
