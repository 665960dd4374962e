"""Cube catalog: facts, dimensions, public (semantic) layer, registry.

Re-expresses the reference's cube DSL on Spark:

* FactTable        - maha Fact (fact/Fact.scala:438-466): physical table +
                     columns + grain + forced filters + cost. Rollup tables
                     (FactBuilder.newRollUp, Fact.scala:1385) are additional
                     FactTables on the same PublicFact with a discarded-
                     column set and lower row cost; union views
                     (fact/View.scala:24-37) are FactTables whose ``parts``
                     list unions multiple physical tables with per-part
                     constant columns.
* DimensionTable   - maha Dimension (dimension/Dimension.scala:607-631):
                     physical dim + PK + level + optional parent FKs
                     (snowflake chains, Registry.findDimensionPath:776).
* PubCol           - public alias contract (dimension/Dimension.scala:956,
                     fact/Fact.scala:1647): alias -> column + allowed filter
                     ops + validation attributes.
* PublicFact       - the cube (fact/Fact.scala:1747-1821): public aliases
                     over 1..N fact tables + the set of foreign keys to
                     public dimensions + per-schema required filter aliases.
* PublicDimension  - public dim (dimension/Dimension.scala:969-1031).
* Registry         - named catalog (registry/Registry.scala:134-290) with
                     join-path discovery and domain JSON.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from ..core.columns import BaseCol, ConstCol, DerivedDimCol, DerivedFactCol, DimCol, FactCol
from ..core.filters import ALL_OPS, Filter
from ..core.grain import DAILY, Grain
from ..core.schema import Schema


@dataclass(frozen=True)
class ViewPart:
    """One branch of a union view: physical table + constant columns
    (fact/View.scala:24-37; UnionViewRowList per-view constants)."""

    table: str
    constants: dict[str, Any] = field(default_factory=dict)


@dataclass
class FactTable:
    name: str
    columns: dict[str, BaseCol]
    grain: Grain = DAILY
    day_column: Optional[str] = None
    #: cube-level mandatory predicates over PHYSICAL column names
    #: (ForceFilter, fact/Fact.scala:433; validated unique :778)
    forced_filters: list[Filter] = field(default_factory=list)
    #: relative rows estimate for candidate selection
    #: (Registry.getFactRowsCostEstimate:381-400)
    cost: int = 1000
    schemas: set[Schema] = field(default_factory=set)
    #: int, or {requestType: int} (reference getMaxDaysWindow keys the
    #: caps by request type)
    max_days_window: Any = None
    max_days_lookback: Any = None
    #: for rollups: columns NOT present relative to the base fact
    discarded: set[str] = field(default_factory=set)
    #: union view parts; empty = single physical table ``name``
    parts: list[ViewPart] = field(default_factory=list)
    #: physical partition column names (partition pruning)
    partition_columns: list[str] = field(default_factory=list)
    #: ISO date the table has data from; a candidate is disqualified when
    #: the requested window starts earlier (availableOnwardsDate,
    #: fact/Fact.scala getCandidatesFor:1752 — rollups backfilled later
    #: than the base fact must not serve historical windows)
    available_onwards: Optional[str] = None
    #: request-type -> cost multiplier (costMultiplierMap,
    #: fact/Fact.scala:451,490: e.g. an async-tuned copy advertises a
    #: lower AsyncRequest multiplier so async reports prefer it)
    cost_multiplier_map: dict[str, float] = field(default_factory=dict)
    #: stored-aggregation grain: the top-level column names that defined
    #: the GROUP BY when this table was materialized. DECLARE THIS ON
    #: EVERY pre-aggregated table — it marks the table as non-row-grain
    #: (disqualifying it from queryType=scan and from shifted-timezone
    #: requests whose local-day buckets would split stored UTC-grain
    #: partials), and a NON-reaggregatable stored metric (e.g. an exact
    #: distinct kept at this grain, NoopRollup) additionally requires the
    #: request to group by ALL of these columns (``serves_grain``;
    #: fact/Fact.scala withNewGrain re-declares columns at a coarser
    #: grain for the same reason). Empty = row-grain table.
    grain_cols: list[str] = field(default_factory=list)

    def effective_cost(self, request_type: str) -> float:
        return self.cost * self.cost_multiplier_map.get(request_type, 1.0)

    def __post_init__(self) -> None:
        if self.day_column is None:
            for n, c in self.columns.items():
                if isinstance(c, DimCol) and c.is_day_column:
                    self.day_column = n
                    break

    def has_columns(self, names: set[str]) -> bool:
        return names <= set(self.columns)

    def serves_grain(self, needed_cols: set[str],
                     grouped_cols: Optional[set[str]]) -> bool:
        """True unless a needed NON-reaggregatable stored metric would be
        served below/askew of the stored grain: requests needing such a
        column must group by every ``grain_cols`` member (each output
        group then maps onto exactly one stored row, so the pass-through
        value is exact)."""
        if not self.grain_cols or grouped_cols is None:
            return True
        needs_exact = any(
            isinstance(c := self.columns.get(n), FactCol)
            and not c.rollup.reaggregatable
            for n in needed_cols)
        if not needs_exact:
            return True
        return set(self.grain_cols) <= grouped_cols

    def fk_columns(self) -> dict[str, str]:
        """physical col name -> public dimension name"""
        return {n: c.foreign_key for n, c in self.columns.items()
                if isinstance(c, DimCol) and c.foreign_key}

    def covered_dim_cols(self) -> dict[tuple[str, str], str]:
        """(public dim name, dim physical col) -> fact column materializing
        it (``DimCol.materializes`` — denormalized dim attributes stored on
        an aggregate-join rollup)."""
        out: dict[tuple[str, str], str] = {}
        for n, c in self.columns.items():
            if isinstance(c, DimCol) and c.materializes:
                dn, _, dc = c.materializes.partition(".")
                out[(dn, dc)] = n
        return out


@dataclass
class DimensionTable:
    name: str
    columns: dict[str, BaseCol]
    primary_key: str
    #: snowflake level (LevelOne = closest to the apex / smallest)
    level: int = 1
    #: physical col -> parent public dimension name (chain joins)
    parent_keys: dict[str, str] = field(default_factory=dict)
    #: schema label -> physical column enforcing it
    #: (schemaColMap, dimension/Dimension.scala:607)
    schema_col_map: dict[str, str] = field(default_factory=dict)
    cost: int = 100
    #: estimated row count; None = UNKNOWN, never broadcast-hinted — the
    #: join is left unhinted so AQE picks the strategy from observed
    #: sizes. Declare a small cardinality (<= planner ceiling) to opt the
    #: dim into a forced broadcast hint (dimCardinalityEnginePreference,
    #: fact/Fact.scala — the reference also routes on dim cardinality)
    cardinality: Optional[int] = None


@dataclass(frozen=True)
class PubCol:
    alias: str
    name: str  # physical/derived column name in the table
    filter_ops: frozenset[str] = ALL_OPS
    required: bool = False
    filtering_required: bool = False
    #: aliases that may not appear together with this one
    incompatible_columns: frozenset[str] = frozenset()
    #: aliases that must also be filtered when this one is
    depends_on_columns: frozenset[str] = frozenset()
    restricted_schemas: frozenset[str] = frozenset()
    hidden_from_json: bool = False
    is_image: bool = False


@dataclass
class PublicDimension:
    name: str
    table: DimensionTable
    pub_cols: list[PubCol]
    #: public alias of the primary key (e.g. "Order Key")
    pk_alias: str = ""
    #: grain aliases usable for high-cardinality warning (not enforced)
    high_cardinality_filters: list[Filter] = field(default_factory=list)

    def __post_init__(self) -> None:
        self._by_alias = {p.alias: p for p in self.pub_cols}
        if not self.pk_alias:
            for p in self.pub_cols:
                if p.name == self.table.primary_key:
                    self.pk_alias = p.alias

    def alias_map(self) -> dict[str, PubCol]:
        return self._by_alias

    @property
    def level(self) -> int:
        return self.table.level


@dataclass
class PublicFact:
    name: str  # cube name
    tables: list[FactTable]  # base fact first; rollups/union views after
    pub_cols: list[PubCol]  # dim-role aliases (group-by-able)
    pub_fact_cols: list[PubCol]  # metric aliases
    #: schema -> required filter alias (fact/Fact.scala:1752)
    schema_required_alias: dict[str, str] = field(default_factory=dict)
    #: int, or {requestType: int} per-request-type caps
    max_days_window: Any = None
    max_days_lookback: Any = None
    #: request-level forced filters over PUBLIC aliases
    forced_filters: list[Filter] = field(default_factory=list)
    revision: int = 0
    #: allow queries with no Day filter (reference requires Day; tests may relax)
    require_day_filter: bool = True
    day_alias: str = "Day"

    def __post_init__(self) -> None:
        self._dim_by_alias = {p.alias: p for p in self.pub_cols}
        self._fact_by_alias = {p.alias: p for p in self.pub_fact_cols}

    def dim_alias_map(self) -> dict[str, PubCol]:
        return self._dim_by_alias

    def fact_alias_map(self) -> dict[str, PubCol]:
        return self._fact_by_alias

    def col_by_alias(self, alias: str) -> Optional[PubCol]:
        return self._dim_by_alias.get(alias) or self._fact_by_alias.get(alias)

    @property
    def base_table(self) -> FactTable:
        return self.tables[0]

    def candidate_tables(self, needed_cols: set[str],
                         request_type: str = "SyncRequest",
                         schema: Optional[str] = None,
                         grouped_cols: Optional[set[str]] = None) \
            -> list[FactTable]:
        """Fact tables covering the needed physical columns AND
        registered for the request schema (when the table declares any),
        serving the request's grain (``FactTable.serves_grain`` — a
        pre-aggregated exact-distinct is only valid AT its stored grain),
        cheapest first under the request-type cost multiplier
        (PublicFact.getCandidatesFor + findBestFactCandidate,
        QueryPipeline.scala:487-561; costMultiplierMap Fact.scala:451)."""
        out = [t for t in self.tables if t.has_columns(needed_cols)
               and (schema is None or not t.schemas
                    or schema in {str(s) for s in t.schemas})
               and t.serves_grain(needed_cols, grouped_cols)]
        return sorted(out, key=lambda t: (t.effective_cost(request_type),
                                          t.cost))


class Registry:
    """Named set of cubes + dimensions, versioned by revision
    (registry/Registry.scala:134-290)."""

    def __init__(self) -> None:
        self._facts: dict[tuple[str, int], PublicFact] = {}
        self._default_rev: dict[str, int] = {}
        self._dims: dict[str, PublicDimension] = {}

    def register_fact(self, fact: PublicFact, default: bool = True) -> None:
        self._facts[(fact.name, fact.revision)] = fact
        if default or fact.name not in self._default_rev:
            self._default_rev[fact.name] = fact.revision

    def register_dimension(self, dim: PublicDimension) -> None:
        self._dims[dim.name] = dim

    def fact(self, name: str, revision: Optional[int] = None) -> PublicFact:
        rev = self._default_rev.get(name) if revision is None else revision
        key = (name, rev)
        if key not in self._facts:
            raise KeyError(f"unknown cube {name!r} (revision {rev})")
        return self._facts[key]

    def dimension(self, name: str) -> PublicDimension:
        if name not in self._dims:
            raise KeyError(f"unknown dimension {name!r}")
        return self._dims[name]

    def cubes(self) -> list[str]:
        return sorted(self._default_rev)

    def find_dimension_path(self, from_dim: str, to_dim: str) -> list[str]:
        """BFS up parent_keys chains (Registry.findDimensionPath:776)."""
        if from_dim == to_dim:
            return [from_dim]
        frontier = [[from_dim]]
        seen = {from_dim}
        while frontier:
            path = frontier.pop(0)
            d = self._dims[path[-1]]
            for parent in d.table.parent_keys.values():
                if parent in seen:
                    continue
                np = path + [parent]
                if parent == to_dim:
                    return np
                seen.add(parent)
                frontier.append(np)
        raise KeyError(f"no dimension path {from_dim} -> {to_dim}")

    def _cube_domain_entry(self, f: "PublicFact") -> dict[str, Any]:
        return {
            "name": f.name,
            "mainEntityIds": f.schema_required_alias,
            "maxDaysWindow": f.max_days_window,
            "maxDaysLookBack": f.max_days_lookback,
            "fields": [
                {"field": p.alias, "type": "Dimension",
                 "filterable": bool(p.filter_ops),
                 "filterOperations": sorted(p.filter_ops),
                 "required": p.required,
                 "filteringRequired": p.filtering_required,
                 # isImageColumn (dimension/Dimension.scala:965):
                 # clients render the value as an image/binary ref
                 "isImageColumn": p.is_image}
                for p in f.pub_cols if not p.hidden_from_json
            ] + [
                {"field": p.alias, "type": "Fact",
                 "filterable": bool(p.filter_ops),
                 "filterOperations": sorted(p.filter_ops),
                 "required": p.required,
                 "filteringRequired": p.filtering_required}
                for p in f.pub_fact_cols if not p.hidden_from_json
            ],
        }

    def domain_json(self) -> dict[str, Any]:
        """Discovery document (Registry domain JSON :685,738)."""
        cubes = {name: self._cube_domain_entry(self.fact(name))
                 for name in self.cubes()}
        return {"schemas": self._schema_map(), "cubes": cubes,
                "dimensions": sorted(self._dims)}

    def _schema_map(self) -> dict[str, list[str]]:
        """schema label -> cube names (Registry.scala:755-760)."""
        out: dict[str, set[str]] = {}
        for name in self.cubes():
            for t in self.fact(name).tables:
                for sch in t.schemas:
                    out.setdefault(str(sch), set()).add(name)
        return {k: sorted(v) for k, v in sorted(out.items())}

    def cube_json(self, name: str,
                  revision: Optional[int] = None) -> dict[str, Any]:
        """Per-cube slice of the domain document
        (Registry.cubesJsonStringByName :685)."""
        if (name, self._default_rev.get(name) if revision is None
                else revision) not in self._facts:
            raise KeyError(f"unknown cube {name!r}")
        # build from the REQUESTED revision's fact — the domain document
        # always reflects the default revision
        return self._cube_domain_entry(self.fact(name, revision))

    def flatten_domain_json(self) -> dict[str, Any]:
        """Flat discovery document (Registry.flattenDomainJsonAsString
        :738-768): cube/dimension field NAMES only, plus the
        schema -> cubes map — the lightweight shape UI pickers consume."""
        return {
            "dimensions": [
                {"name": n,
                 "fields": [p.alias for p in self._dims[n].pub_cols
                            if not p.hidden_from_json]}
                for n in sorted(self._dims)],
            "schemas": self._schema_map(),
            "cubes": [self.flatten_cube_json(n) for n in self.cubes()],
        }

    def flatten_cube_json(self, name: str,
                          revision: Optional[int] = None) -> dict[str, Any]:
        """Flat per-cube field list
        (Registry.getFlattenCubeJsonAsStringForCube :770)."""
        f = self.fact(name, revision)
        return {
            "name": name,
            "mainEntityIds": f.schema_required_alias,
            "fields": [p.alias for p in (f.pub_cols + f.pub_fact_cols)
                       if not p.hidden_from_json],
        }
