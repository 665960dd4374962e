"""Filter language: the reference's 17 filter operations
(maha `core/.../FilterOperation.scala:37-54` ops, `:98-376` ASTs).

Each filter AST resolves to a single Spark ``Column`` predicate given a
``FieldResolver`` (alias -> physical expression + column metadata).
Semantics preserved from the reference:

* case-insensitive compare when the column is annotated (lower() both sides,
  SqlEqualityFilterRenderer FilterOperation.scala:753)
* static-mapping labels in filter values expand through the REVERSE map to
  IN over raw stored values (DataType.scala:25,44-45), incl. non-unique
  reverse maps -> multiple raw values per label
* Between is inclusive; the Day between filter is mandatory per request
* OuterFilter applies on final projected aliases after join/agg
* PushDownFilter forces a dim filter onto the fact side (automatic in
  Spark's predicate pushdown; kept for API parity)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Protocol, Sequence

from pyspark.sql import Column, functions as F

from .types import DataType


class FieldResolver(Protocol):
    def __call__(self, alias: str) -> "ResolvedField": ...


@dataclass(frozen=True)
class ResolvedField:
    col: Column
    dtype: Optional[DataType] = None
    case_insensitive: bool = False
    #: SQL fragment for this field (needed by ExpressionFilter, which
    #: splices resolved fields into a textual SQL predicate)
    sql: Optional[str] = None


def _map_value(rf: ResolvedField, v: Any) -> list[Any]:
    """Translate one filter value through the reverse static mapping if the
    column has one; returns the list of raw values it corresponds to."""
    dt = rf.dtype
    if dt is not None and dt.has_static_mapping:
        rev = dt.static_mapping.reverse
        if isinstance(v, str) and v in rev:
            return list(rev[v])
    return [v]


def _map_values(rf: ResolvedField, values: Sequence[Any]) -> list[Any]:
    out: list[Any] = []
    for v in values:
        out.extend(_map_value(rf, v))
    return out


def _cmp_sides(rf: ResolvedField, v: Any) -> tuple[Column, Any]:
    if rf.case_insensitive and isinstance(v, str):
        return F.lower(rf.col), v.lower()
    return rf.col, v


@dataclass(frozen=True)
class Filter:
    field: str
    operator: str = ""
    #: validation category for allowed-op checks (FilterOperation enum value)
    is_forced: bool = False
    is_overridable: bool = False

    def to_column(self, resolve: FieldResolver) -> Column:  # pragma: no cover
        raise NotImplementedError

    def fields(self) -> list[str]:
        return [self.field]


@dataclass(frozen=True)
class InFilter(Filter):
    values: tuple[Any, ...] = ()
    operator: str = "in"

    def to_column(self, resolve: FieldResolver) -> Column:
        rf = resolve(self.field)
        vals = _map_values(rf, self.values)
        if rf.case_insensitive:
            return F.lower(rf.col).isin([v.lower() if isinstance(v, str) else v for v in vals])
        return rf.col.isin(vals)


@dataclass(frozen=True)
class NotInFilter(Filter):
    values: tuple[Any, ...] = ()
    operator: str = "not in"

    def to_column(self, resolve: FieldResolver) -> Column:
        rf = resolve(self.field)
        vals = _map_values(rf, self.values)
        if rf.case_insensitive:
            return ~F.lower(rf.col).isin([v.lower() if isinstance(v, str) else v for v in vals])
        return ~rf.col.isin(vals)


@dataclass(frozen=True)
class BetweenFilter(Filter):
    from_value: Any = None
    to_value: Any = None
    operator: str = "between"

    def to_column(self, resolve: FieldResolver) -> Column:
        rf = resolve(self.field)
        return rf.col.between(F.lit(self.from_value), F.lit(self.to_value))


@dataclass(frozen=True)
class DateTimeBetweenFilter(Filter):
    """ISO8601 datetime range (FilterOperation.scala:161-249)."""

    from_value: str = ""
    to_value: str = ""
    operator: str = "datetimebetween"

    def to_column(self, resolve: FieldResolver) -> Column:
        rf = resolve(self.field)
        return (rf.col >= F.to_timestamp(F.lit(self.from_value))) & (
            rf.col <= F.to_timestamp(F.lit(self.to_value)))


@dataclass(frozen=True)
class EqualityFilter(Filter):
    value: Any = None
    operator: str = "="

    def to_column(self, resolve: FieldResolver) -> Column:
        rf = resolve(self.field)
        vals = _map_value(rf, self.value)
        if len(vals) > 1:  # label with non-unique reverse map -> IN
            return rf.col.isin(vals)
        lhs, v = _cmp_sides(rf, vals[0])
        return lhs == F.lit(v)


@dataclass(frozen=True)
class NotEqualToFilter(Filter):
    value: Any = None
    operator: str = "<>"

    def to_column(self, resolve: FieldResolver) -> Column:
        rf = resolve(self.field)
        vals = _map_value(rf, self.value)
        if len(vals) > 1:
            return ~rf.col.isin(vals)
        lhs, v = _cmp_sides(rf, vals[0])
        return lhs != F.lit(v)


@dataclass(frozen=True)
class GreaterThanFilter(Filter):
    value: Any = None
    operator: str = ">"

    def to_column(self, resolve: FieldResolver) -> Column:
        return resolve(self.field).col > F.lit(self.value)


@dataclass(frozen=True)
class LessThanFilter(Filter):
    value: Any = None
    operator: str = "<"

    def to_column(self, resolve: FieldResolver) -> Column:
        return resolve(self.field).col < F.lit(self.value)


@dataclass(frozen=True)
class LikeFilter(Filter):
    """Substring match: renders as '%value%' (SqlLikeFilterRenderer
    FilterOperation.scala:885)."""

    value: str = ""
    operator: str = "like"

    def to_column(self, resolve: FieldResolver) -> Column:
        rf = resolve(self.field)
        if rf.case_insensitive:
            return F.lower(rf.col).like(f"%{self.value.lower()}%")
        return rf.col.like(f"%{self.value}%")


@dataclass(frozen=True)
class NotLikeFilter(Filter):
    value: str = ""
    operator: str = "not like"

    def to_column(self, resolve: FieldResolver) -> Column:
        rf = resolve(self.field)
        # SQL NOT LIKE is false for NULL; the reference renders plain NOT LIKE
        return ~rf.col.like(f"%{self.value}%")


@dataclass(frozen=True)
class IsNullFilter(Filter):
    operator: str = "isnull"

    def to_column(self, resolve: FieldResolver) -> Column:
        return resolve(self.field).col.isNull()


@dataclass(frozen=True)
class IsNotNullFilter(Filter):
    operator: str = "isnotnull"

    def to_column(self, resolve: FieldResolver) -> Column:
        return resolve(self.field).col.isNotNull()


@dataclass(frozen=True)
class FieldEqualityFilter(Filter):
    """Column-to-column compare ('==', FilterOperation.scala:287; Druid
    ColumnComparisonDimFilter :1112)."""

    compare_to: str = ""
    operator: str = "=="

    def to_column(self, resolve: FieldResolver) -> Column:
        return resolve(self.field).col == resolve(self.compare_to).col

    def fields(self) -> list[str]:
        return [self.field, self.compare_to]


@dataclass(frozen=True)
class ExpressionFilter(Filter):
    """JavaScriptFilter parity (FilterOperation.scala:278; Druid JS filter
    rendering :1074). The reference ships a JavaScript predicate to Druid;
    executing user JS in Spark would force a per-row Python/JS bridge, so
    the predicate is a Spark SQL boolean expression instead -- same intent
    (an arbitrary predicate over one or more fields), but it stays inside
    JVM whole-stage codegen. Fields are referenced as ``{alias}``
    placeholders and resolve through the same alias resolution as every
    other filter; registered UDFs (functions.register_udf) and
    DerivedFunction macros are usable inside the expression.
    """

    expression: str = ""
    operator: str = "expression"

    def to_column(self, resolve: FieldResolver) -> Column:
        from .columns import _PLACEHOLDER, expand_expr
        resolver: dict[str, str] = {}
        for name in set(_PLACEHOLDER.findall(self.expression)):
            rf = resolve(name)
            if rf.sql is None:
                raise ValueError(
                    f"field {name!r} cannot be used in an expression filter "
                    "(no SQL rendering available)")
            resolver[name] = rf.sql
        return F.expr(expand_expr(self.expression, resolver))

    def fields(self) -> list[str]:
        from .columns import _PLACEHOLDER
        refs = list(dict.fromkeys(_PLACEHOLDER.findall(self.expression)))
        if self.field and self.field not in refs:
            refs.insert(0, self.field)
        return refs


@dataclass(frozen=True)
class OrFilter(Filter):
    filters: tuple[Filter, ...] = ()
    operator: str = "or"
    field: str = ""

    def to_column(self, resolve: FieldResolver) -> Column:
        cols = [f.to_column(resolve) for f in self.filters]
        out = cols[0]
        for c in cols[1:]:
            out = out | c
        return out

    def fields(self) -> list[str]:
        return [fld for f in self.filters for fld in f.fields()]


@dataclass(frozen=True)
class AndFilter(Filter):
    filters: tuple[Filter, ...] = ()
    operator: str = "and"
    field: str = ""

    def to_column(self, resolve: FieldResolver) -> Column:
        cols = [f.to_column(resolve) for f in self.filters]
        out = cols[0]
        for c in cols[1:]:
            out = out & c
        return out

    def fields(self) -> list[str]:
        return [fld for f in self.filters for fld in f.fields()]


@dataclass(frozen=True)
class OuterFilter(Filter):
    """Applied on the FINAL projected aliases after join/agg
    (FilterOperation.scala:141; QueryPipeline.scala:498-500)."""

    filters: tuple[Filter, ...] = ()
    operator: str = "outer"
    field: str = ""

    def to_column(self, resolve: FieldResolver) -> Column:
        return AndFilter(field="", filters=self.filters).to_column(resolve)

    def fields(self) -> list[str]:
        return [fld for f in self.filters for fld in f.fields()]


@dataclass(frozen=True)
class PushDownFilter(Filter):
    """Forces a dim filter onto the fact side (FilterOperation.scala:134).
    Spark's predicate pushdown makes this automatic; kept for API parity."""

    inner: Optional[Filter] = None
    operator: str = "pushdown"
    field: str = ""

    def to_column(self, resolve: FieldResolver) -> Column:
        assert self.inner is not None
        return self.inner.to_column(resolve)

    def fields(self) -> list[str]:
        return self.inner.fields() if self.inner else []


# ---------------------------------------------------------------------------
# Allowed-operation sets (FilterOperation.scala:56-96 convenience sets)
# ---------------------------------------------------------------------------

EQUALITY = frozenset({"="})
IN = frozenset({"in"})
BETWEEN = frozenset({"between"})
LIKE = frozenset({"like"})
IN_EQUALITY = IN | EQUALITY
IN_BETWEEN_EQUALITY = IN | BETWEEN | EQUALITY
IN_NOTIN_EQUALITY = IN | frozenset({"not in"}) | EQUALITY
IN_NOTIN_BETWEEN_EQUALITY = IN_BETWEEN_EQUALITY | frozenset({"not in"})
IN_NOTIN_EQUALITY_LIKE = IN_NOTIN_EQUALITY | LIKE
IN_NOTIN_EQUALITY_NOTEQUALS_LIKE = IN_NOTIN_EQUALITY_LIKE | frozenset({"<>"})
ALL_OPS = frozenset({
    "in", "not in", "between", "datetimebetween", "=", "<>", ">", "<",
    "like", "not like", "isnull", "isnotnull", "==", "or", "and",
    "expression",
})


def parse_filter_json(obj: dict[str, Any]) -> Filter:
    """Parse one filterExpression JSON object (ReportingRequest.deserialize,
    request/ReportingRequest.scala:360-480 filter section)."""
    op = str(obj.get("operator", "")).lower().strip()
    fld = obj.get("field", "")
    if op == "in":
        return InFilter(field=fld, values=tuple(obj["values"]))
    if op in ("not in", "notin"):
        return NotInFilter(field=fld, values=tuple(obj["values"]))
    if op == "between":
        return BetweenFilter(field=fld, from_value=obj["from"], to_value=obj["to"])
    if op in ("datetimebetween", "date time between"):
        # validate ISO-8601 at parse time (DateTimeBetweenFilterHelper
        # format check) instead of surfacing a runtime cast failure
        import datetime as _dt
        for k in ("from", "to"):
            v = str(obj[k])
            try:
                _dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
            except ValueError:
                raise ValueError(
                    f"datetimebetween {k!r} must be an ISO-8601 datetime, "
                    f"got {v!r}") from None
        return DateTimeBetweenFilter(field=fld, from_value=obj["from"], to_value=obj["to"])
    if op in ("=", "equals", "equality"):
        return EqualityFilter(field=fld, value=obj["value"])
    if op == "<>":
        return NotEqualToFilter(field=fld, value=obj["value"])
    if op == ">":
        return GreaterThanFilter(field=fld, value=obj["value"])
    if op == "<":
        return LessThanFilter(field=fld, value=obj["value"])
    if op == "like":
        return LikeFilter(field=fld, value=obj["value"])
    if op in ("not like", "notlike"):
        return NotLikeFilter(field=fld, value=obj["value"])
    if op in ("isnull", "is null"):
        return IsNullFilter(field=fld)
    if op in ("isnotnull", "is not null"):
        return IsNotNullFilter(field=fld)
    if op == "==":
        return FieldEqualityFilter(field=fld, compare_to=obj["compareTo"])
    if op in ("expression", "javascript"):
        # "function" accepted for JavaScriptFilter-shaped request JSON
        return ExpressionFilter(field=fld,
                                expression=obj.get("expression") or
                                obj.get("function", ""))
    if op in ("or", "and"):
        inner = tuple(parse_filter_json(f)
                      for f in obj.get("filterExpressions", ()))
        if not inner:
            # RequestModelTest "should fail when using or with empty
            # filters"
            raise ValueError(f"{op!r} filter requires at least one "
                             f"inner filterExpression")
        return (OrFilter if op == "or" else AndFilter)(filters=inner)
    if op == "outer":
        # the reference's JSON key is "outerFilters"
        # (FilterOperation.scala:1998 OuterFilter.applyJSON);
        # "filterExpressions" stays accepted for symmetry with or/and
        inner = obj.get("outerFilters", obj.get("filterExpressions", ()))
        return OuterFilter(filters=tuple(parse_filter_json(f)
                                         for f in inner))
    if op == "pushdown":
        return PushDownFilter(inner=parse_filter_json(obj["filterExpression"]))
    raise ValueError(f"unsupported filter operator: {op!r}")
