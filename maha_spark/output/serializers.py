"""Result serialization: the reference's JSON envelope + CSV.

JSON shape mirrors maha `service/.../output/JsonOutputFormat.scala:80-335`:

    {"header": {"cube": ..., "fields": [{"fieldName":..., "fieldType":...}],
                "maxRows": n, "debug": {}},
     "rows": [[...], ...],
     "curators": {name: {...}}}

CSV mirrors `core/.../report/RowCSVWriter.scala` (header row + values).
Rows stream via ``toLocalIterator`` so the driver never materializes the
whole result (the reference spills RowLists to RocksDB for the same
reason, query/OffHeapRowList.scala:40-83).
"""

from __future__ import annotations

import csv
import datetime as _dt
import io
import json
from decimal import Decimal
from typing import Any, Iterable, Optional

from pyspark.sql import DataFrame


def _json_value(v: Any) -> Any:
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    if isinstance(v, bytearray):
        return bytes(v).hex()
    if isinstance(v, bytes):
        return v.hex()
    return v


def field_types(df: DataFrame, metric_aliases: set[str]) -> list[dict[str, str]]:
    return [{"fieldName": f.name,
             "fieldType": "FACT" if f.name in metric_aliases else "DIM"}
            for f in df.schema.fields]


def to_json_response(df: DataFrame, cube: str,
                     metric_aliases: Optional[set[str]] = None,
                     max_rows: int = -1,
                     curators: Optional[dict[str, Any]] = None,
                     debug: Optional[dict[str, Any]] = None,
                     stream: bool = False) -> dict[str, Any]:
    metric_aliases = metric_aliases or set()
    rows_iter: Iterable = df.toLocalIterator() if stream else df.collect()
    rows = [[_json_value(v) for v in row] for row in rows_iter]
    out: dict[str, Any] = {
        "header": {
            "cube": cube,
            "fields": field_types(df, metric_aliases),
            "maxRows": max_rows,
        },
        "rows": rows,
    }
    if debug:
        out["header"]["debug"] = debug
    if curators:
        out["curators"] = curators
    return out


def to_json_string(df: DataFrame, cube: str, **kw: Any) -> str:
    return json.dumps(to_json_response(df, cube, **kw))


def to_csv_string(df: DataFrame) -> str:
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(df.columns)
    for row in df.toLocalIterator():
        w.writerow(["" if v is None else _json_value(v) for v in row])
    return buf.getvalue()
