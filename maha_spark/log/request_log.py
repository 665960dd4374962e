"""Per-request stats logging (the reference's ``request-log`` module).

The reference emits one protobuf record per request to Kafka
(``request-log/src/proto/MahaRequestLog.proto``; writer
``KafkaMahaRequestLogWriter.scala``, multi-colo fan-out
``KafkaMultiColoRequestLogWriter.scala``), populated by the service
layer from the analyzed RequestModel. This rebuild keeps the same record
shape and lifecycle (log on success AND on validation/execution failure,
never throw into the serving path) with pluggable writers:

* ``JsonlRequestLogWriter`` — newline-delimited JSON to a local/shared
  file; the slot where a Kafka producer would sit in production (the
  container has no Kafka client, and at 100 TB the log volume is one
  small record per *request*, not per row — any sink works).
* ``CollectingRequestLogWriter`` — in-memory, for tests and metrics.
* ``MultiRequestLogWriter`` — fan-out to several writers
  (KafkaMultiColoRequestLogWriter semantics: each colo independent, one
  failing writer never blocks the others).
* ``NoopRequestLogWriter`` — the default.

Field parity notes (proto field -> here): requestId/userId/cube/schema/
requestType/status/errorMessage/requestStartTime/requestEndTime map
1:1; drivingTable = the selected fact table (single-engine build, so
drivingQueryEngine is always "spark" and the multi-engine
firstSubsequentQuery* fields collapse away); the has*Filters /
has*SortBy / isFactDriven flags derive from the RequestModel exactly as
``MahaRequestLogHelper`` does; factCost carries every candidate fact
table with its declared cost (Registry.getCandidatesFor parity).
"""

from __future__ import annotations

import json
import socket
import threading
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class RequestLogEntry:
    """One record per request (MahaRequestLog.proto field subset that
    survives the single-engine collapse)."""

    request_id: str
    json_request: str
    user_id: str = ""
    cube: str = ""
    cube_revision: int = 0
    schema: str = ""
    request_type: str = "SyncRequest"
    status: int = 200
    error_message: str = ""
    request_start_time: int = 0   # epoch millis
    request_end_time: int = 0
    driving_query_engine: str = "spark"
    driving_table: str = ""
    time_grain: str = ""
    has_fact_filters: bool = False
    has_dim_filters: bool = False
    has_fact_sort_by: bool = False
    has_dim_sort_by: bool = False
    is_fact_driven: bool = True
    is_dim_driven: bool = False
    has_dim_and_fact_operations: bool = False
    request_sort_by_cols: list[dict[str, str]] = field(default_factory=list)
    dimensions_candidates: list[str] = field(default_factory=list)
    fact_cost: list[dict[str, Any]] = field(default_factory=list)
    is_dry_run: bool = False
    is_debug: bool = False
    is_test: bool = False
    curators: list[str] = field(default_factory=list)
    registry_name: str = "maha"
    hostname: str = field(default_factory=socket.gethostname)
    job_name: str = ""
    labels: list[str] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


def new_request_id() -> str:
    return str(uuid.uuid4())


def now_ms() -> int:
    return int(time.time() * 1000)


def build_log_entry(model: Any, *, request_id: str, raw_request: str,
                    schema: str, user_id: str = "",
                    registry_name: str = "maha") -> RequestLogEntry:
    """Populate the model-derived fields (MahaRequestLogHelper parity:
    the helper reads the same flags off the Scala RequestModel)."""
    req = model.request
    return RequestLogEntry(
        request_id=request_id,
        json_request=raw_request,
        user_id=user_id,
        cube=req.cube,
        cube_revision=model.cube.revision,
        schema=schema,
        request_type=req.request_type,
        driving_table=model.fact_table.name,
        time_grain=model.fact_table.grain,
        has_fact_filters=bool(model.fact_filters),
        has_dim_filters=any(c.has_filters for c in model.chains),
        has_fact_sort_by=bool(model.fact_sorts),
        has_dim_sort_by=bool(model.dim_sorts),
        is_fact_driven=not model.is_dim_driven,
        is_dim_driven=model.is_dim_driven,
        has_dim_and_fact_operations=bool(model.chains)
        and not model.is_dim_only,
        request_sort_by_cols=[{"alias": s.field, "order": s.order}
                              for s in (*model.fact_sorts,
                                        *model.dim_sorts)],
        dimensions_candidates=sorted(
            d.name for c in model.chains for d in c.dims),
        fact_cost=[{"name": t.name, "engine": "spark", "cost": t.cost}
                   for t in model.cube.tables],
        is_debug=req.is_debug,
        is_test=bool(getattr(req, "test_name", "")),
        curators=sorted(req.curators or ()),
        # the operational additionalParameters (Labels / Job-Name /
        # RegistryName / HostName, Request.scala:135-166) land in the
        # record like the reference's MahaRequestLogHelper: request-level
        # values override the service-level defaults
        registry_name=getattr(req, "registry_name", None) or registry_name,
        hostname=getattr(req, "host_name", None) or socket.gethostname(),
        job_name=getattr(req, "job_name", ""),
        labels=list(getattr(req, "labels", []) or []),
    )


# ---------------------------------------------------------------- writers
class NoopRequestLogWriter:
    def log(self, entry: RequestLogEntry) -> None:  # pragma: no cover
        pass

    def close(self) -> None:  # pragma: no cover
        pass


class CollectingRequestLogWriter:
    """In-memory sink (tests / metrics scraping)."""

    def __init__(self) -> None:
        self.entries: list[RequestLogEntry] = []
        self._lock = threading.Lock()

    def log(self, entry: RequestLogEntry) -> None:
        _validate(entry)
        with self._lock:
            self.entries.append(entry)

    def close(self) -> None:
        pass


class JsonlRequestLogWriter:
    """Append-only newline-delimited JSON file, thread-safe.

    The production slot for a Kafka producer
    (KafkaMahaRequestLogWriter.scala:70-95 ``writeMahaRequestProto``):
    same validate-then-emit contract, one bounded record per request."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()

    def log(self, entry: RequestLogEntry) -> None:
        _validate(entry)
        line = json.dumps(entry.to_dict(), separators=(",", ":"))
        with self._lock, open(self.path, "a") as f:
            f.write(line + "\n")

    def close(self) -> None:
        pass


class MultiRequestLogWriter:
    """Fan-out to N writers; one failing sink never blocks the others or
    the serving path (KafkaMultiColoRequestLogWriter semantics)."""

    def __init__(self, *writers: Any) -> None:
        self.writers = list(writers)
        self.errors: list[str] = []

    def log(self, entry: RequestLogEntry) -> None:
        for w in self.writers:
            try:
                w.log(entry)
            except Exception as e:
                self.errors.append(f"{type(w).__name__}: {e}")

    def close(self) -> None:
        for w in self.writers:
            try:
                w.close()
            except Exception:  # pragma: no cover
                pass


def _validate(entry: RequestLogEntry) -> None:
    """KafkaMahaRequestLogWriter.validate parity: requestId and the raw
    request payload are required; a blank record is a caller bug."""
    if not entry.request_id:
        raise ValueError("request log entry missing request_id")
    if entry.json_request is None:
        raise ValueError("request log entry missing json_request")


# ------------------------------------------------------------- protobuf
def to_proto_bytes(entry: RequestLogEntry) -> bytes:
    """Serialize an entry as the reference's ``MahaRequestProto`` record
    (``request-log/src/proto/MahaRequestLog.proto`` — field numbers match
    that file; the Kafka writer ships exactly these bytes,
    KafkaMahaRequestLogWriter.scala:70-95). Engine-enum fields
    (drivingQueryEngine is a string field, factCost.engine is an enum
    with no Spark member) carry the single-engine collapse: the string
    says "spark", the enum is omitted."""
    from ..core.protowire import f_bool, f_len, f_str, f_varint

    b = f_str(1, entry.request_id)
    b += f_len(2, entry.json_request.encode("utf-8"))
    b += f_str(3, entry.user_id)
    b += f_str(4, entry.cube)
    b += f_str(5, entry.schema)
    # requestType enum: SYNC = 0 / ASYNC = 1
    b += f_varint(7, 1 if entry.request_type == "AsyncRequest" else 0)
    b += f_str(8, entry.driving_query_engine)
    b += f_str(9, entry.driving_table)
    b += f_varint(13, entry.request_start_time)
    b += f_varint(14, entry.request_end_time)
    b += f_varint(15, entry.status)
    b += f_str(16, entry.error_message)
    b += f_bool(17, entry.has_fact_filters)
    b += f_bool(19, entry.has_dim_filters)
    b += f_bool(21, entry.has_fact_sort_by)
    b += f_bool(22, entry.has_dim_sort_by)
    b += f_bool(23, entry.is_fact_driven)
    b += f_bool(24, entry.is_dim_driven)
    b += f_bool(27, entry.has_dim_and_fact_operations)
    for s in entry.request_sort_by_cols:  # SortByColumnInfo = 29
        b += f_len(29, f_str(1, s.get("alias", ""))
                   + f_varint(2, 1 if s.get("order", "").upper() == "DESC"
                              else 0))
    for d in entry.dimensions_candidates:
        b += f_str(30, d)
    for fc in entry.fact_cost:  # FactCost = 31 (name=1, cost=3)
        b += f_len(31, f_str(1, str(fc.get("name", "")))
                   + f_varint(3, int(fc.get("cost", 0))))
    b += f_str(37, str(entry.time_grain))
    b += f_bool(39, entry.is_dry_run)
    b += f_str(41, entry.job_name)
    b += f_varint(44, entry.cube_revision)
    b += f_str(45, entry.registry_name)
    b += f_str(46, entry.hostname)
    b += f_str(49, ",".join(entry.curators))
    b += f_bool(54, entry.is_debug)
    b += f_bool(55, entry.is_test)
    for lbl in entry.labels:  # repeated string labels = 57
        b += f_str(57, lbl)
    return b


class ProtoRequestLogWriter:
    """Length-prefixed MahaRequestProto records in a local file — the
    same framing a Kafka producer would ship per message (the production
    slot for KafkaMahaRequestLogWriter / multi-colo fan-out)."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()

    def log(self, entry: RequestLogEntry) -> None:
        from ..core.protowire import _uvarint
        _validate(entry)
        rec = to_proto_bytes(entry)
        with self._lock, open(self.path, "ab") as f:
            f.write(_uvarint(len(rec)) + rec)

    def close(self) -> None:
        pass
