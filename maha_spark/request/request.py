"""ReportingRequest: the JSON request language.

Mirrors maha `core/.../request/ReportingRequest.scala:54-74` /
`Request.scala:21-168`:

* cube, selectFields [{field, alias?, value?}], filterExpressions,
  sortBy [{field, order}], paginationStartIndex, rowsPerPage
* flags: includeRowCount, forceDimensionDriven/forceFactDriven, isDebug,
  queryType (groupby/scan/rowcount), requestType (sync/async), distinct
* curatorJsonConfigMap ("curators" section)

Validation accumulates ALL errors (the reference uses scalaz
ValidationNel; ReportingRequest.deserialize :360-480) and raises a single
ValidationError listing them.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dfield
from typing import Any, Optional

from ..core.filters import Filter, parse_filter_json

DEFAULT_ROWS_PER_PAGE = 200  # DEFAULT_MR, ReportingRequest.scala:108
MAX_ROWS_SYNC = 5000         # DruidQueryGenerator.scala:164
MAX_ROWS_ASYNC = 100000      # DruidQueryGenerator.scala:166


def _to_bool(v) -> bool:
    """Stringly-typed flags through proxies/query builders: 'false'/'0'
    must not enable."""
    if isinstance(v, str):
        return v.strip().lower() in ("true", "1", "yes")
    return bool(v)


class ValidationError(ValueError):
    def __init__(self, errors: list[str]):
        super().__init__("; ".join(errors))
        self.errors = errors


@dataclass(frozen=True)
class SelectField:
    field: str
    alias: Optional[str] = None
    value: Optional[Any] = None  # constant field (Field.value, Request.scala:21)

    @property
    def output_name(self) -> str:
        return self.alias or self.field


@dataclass(frozen=True)
class SortBy:
    field: str
    order: str = "ASC"  # ASC | DESC


@dataclass
class ReportingRequest:
    cube: str
    select_fields: list[SelectField]
    filters: list[Filter] = dfield(default_factory=list)
    sort_by: list[SortBy] = dfield(default_factory=list)
    pagination_start_index: int = 0
    rows_per_page: int = -1
    schema: str = "internal"
    request_type: str = "SyncRequest"   # SyncRequest | AsyncRequest
    query_type: str = "groupby"          # groupby | scan | rowcount
    include_row_count: bool = False
    force_dimension_driven: bool = False
    force_fact_driven: bool = False
    is_distinct: bool = False
    is_debug: bool = False
    test_name: Optional[str] = None
    curators: dict[str, Any] = dfield(default_factory=dict)
    additional_parameters: dict[str, Any] = dfield(default_factory=dict)

    @property
    def max_rows_cap(self) -> int:
        return MAX_ROWS_ASYNC if self.request_type == "AsyncRequest" else MAX_ROWS_SYNC

    def get_parameter(self, name: str, default: Any = None) -> Any:
        """Case-insensitive ``additionalParameters`` lookup — the
        reference deserializes parameter names with
        ``withNameInsensitiveOption`` (core request/Request.scala:188),
        so ``"Job-Name"``, ``"job-name"`` and ``"JOB-NAME"`` are the same
        key."""
        want = name.lower()
        # deterministic resolution when a client sends duplicate
        # case-insensitive keys ("Labels" AND "labels"): an exact-case
        # match wins, else the lexicographically smallest matching key —
        # never dict insertion order
        if name in self.additional_parameters:
            return self.additional_parameters[name]
        hits = sorted(str(k) for k in self.additional_parameters
                      if str(k).lower() == want)
        if hits:
            return self.additional_parameters[hits[0]]
        return default

    # typed accessors for the operational parameters that ride
    # additionalParameters (Request.scala:135-166 ParameterValue family);
    # consumed by the request-log record like MahaRequestLogHelper does
    @property
    def labels(self) -> list[str]:
        v = self.get_parameter("Labels", [])
        if isinstance(v, (list, tuple)):
            return [str(x) for x in v]
        # a scalar label (easy client mistake — the sibling params are all
        # scalars) is logged as a one-element list, not silently dropped —
        # including falsy scalars (0, '', False); only None means absent
        return [] if v is None else [str(v)]

    @property
    def job_name(self) -> str:
        return str(self.get_parameter("Job-Name", "") or "")

    @property
    def registry_name(self) -> Optional[str]:
        v = self.get_parameter("RegistryName")
        return str(v) if v else None

    @property
    def host_name(self) -> Optional[str]:
        v = self.get_parameter("HostName")
        return str(v) if v else None


def parse_request(payload: bytes | str | dict[str, Any],
                  schema: str = "internal",
                  request_type: str = "SyncRequest") -> ReportingRequest:
    errors: list[str] = []
    if isinstance(payload, (bytes, str)):
        try:
            obj = json.loads(payload)
        except json.JSONDecodeError as e:
            raise ValidationError([f"invalid JSON: {e}"]) from e
    else:
        obj = payload

    cube = obj.get("cube")
    if not cube or not isinstance(cube, str):
        errors.append("cube is required")

    fields: list[SelectField] = []
    raw_fields = obj.get("selectFields")
    if not raw_fields or not isinstance(raw_fields, list):
        errors.append("selectFields is required and must be a non-empty list")
    else:
        for i, f in enumerate(raw_fields):
            if not isinstance(f, dict) or "field" not in f:
                errors.append(f"selectFields[{i}] missing 'field'")
                continue
            fields.append(SelectField(field=f["field"], alias=f.get("alias"),
                                      value=f.get("value")))

    filters: list[Filter] = []
    for i, f in enumerate(obj.get("filterExpressions", []) or []):
        try:
            filters.append(parse_filter_json(f))
        except (ValueError, KeyError) as e:
            errors.append(f"filterExpressions[{i}]: {e}")

    sorts: list[SortBy] = []
    for i, s in enumerate(obj.get("sortBy", []) or []):
        order = str(s.get("order", "ASC")).upper()
        if order not in ("ASC", "DESC"):
            errors.append(f"sortBy[{i}]: order must be ASC or DESC, got {s.get('order')!r}")
            order = "ASC"
        sorts.append(SortBy(field=s.get("field", ""), order=order))

    si = obj.get("paginationStartIndex", 0)
    mr = obj.get("rowsPerPage", -1)
    if not isinstance(si, int) or si < 0:
        errors.append("paginationStartIndex must be a non-negative integer")
        si = 0
    if not isinstance(mr, int):
        errors.append("rowsPerPage must be an integer")
        mr = -1

    if _to_bool(obj.get("forceDimensionDriven", False)) and \
            _to_bool(obj.get("forceFactDriven", False)):
        # ReportingRequest.scala:509
        errors.append("both cannot be true: forceDimensionDriven, "
                      "forceFactDriven")

    if errors:
        raise ValidationError(errors)

    return ReportingRequest(
        cube=cube,
        select_fields=fields,
        filters=filters,
        sort_by=sorts,
        pagination_start_index=si,
        rows_per_page=mr,
        schema=obj.get("schema", schema),
        request_type=obj.get("requestType", request_type),
        query_type=obj.get("queryType", "groupby"),
        include_row_count=_to_bool(obj.get("includeRowCount", False)),
        force_dimension_driven=_to_bool(obj.get("forceDimensionDriven",
                                                False)),
        force_fact_driven=_to_bool(obj.get("forceFactDriven", False)),
        is_distinct=_to_bool(obj.get("distinct", False)),
        is_debug=_to_bool(obj.get("debug", False)),
        test_name=obj.get("testName"),
        curators=obj.get("curators", {}) or {},
        additional_parameters=obj.get("additionalParameters", {}) or {},
    )
