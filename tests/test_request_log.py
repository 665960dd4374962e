"""Request-stats logging (reference ``request-log`` module parity:
MahaRequestLog.proto record shape, KafkaMahaRequestLogWriter validate
contract, KafkaMultiColoRequestLogWriter fan-out, logFailed path)."""

from __future__ import annotations

import json

import pytest

from maha_spark.log import (CollectingRequestLogWriter, JsonlRequestLogWriter,
                            MultiRequestLogWriter, RequestLogEntry)

DAY = {"field": "Day", "operator": "between",
       "from": "1995-01-01", "to": "2002-12-31"}
REQ = {
    "cube": "lineitem_stats",
    "selectFields": [{"field": "Nation Name"}, {"field": "Revenue"}],
    "filterExpressions": [DAY],
    "sortBy": [{"field": "Revenue", "order": "DESC"}],
    "rowsPerPage": 5,
}


@pytest.fixture()
def logged_engine(spark, sf_dir):
    from maha_spark.engine import MahaSparkEngine
    from maha_spark.examples.tpch import build_registry
    from maha_spark.plans.binding import ParquetBinding

    sink = CollectingRequestLogWriter()
    eng = MahaSparkEngine(spark, build_registry(),
                          ParquetBinding(spark, sf_dir),
                          request_logger=sink, registry_name="er")
    return eng, sink


def test_success_entry_fields(logged_engine):
    eng, sink = logged_engine
    eng.execute(json.dumps(REQ), schema="internal", user_id="u1",
                request_id="rid-1")
    assert len(sink.entries) == 1
    e = sink.entries[0]
    assert e.request_id == "rid-1"
    assert e.user_id == "u1"
    assert e.cube == "lineitem_stats"
    assert e.schema == "internal"
    assert e.status == 200 and e.error_message == ""
    assert e.driving_query_engine == "spark"
    assert e.driving_table  # selected fact table
    assert e.has_fact_filters  # the Day between filter
    assert e.is_fact_driven and not e.is_dim_driven
    # Nation Name resolves through the customer->nation chain
    assert "nation" in " ".join(e.dimensions_candidates)
    assert e.request_sort_by_cols == [{"alias": "Revenue", "order": "DESC"}]
    assert e.fact_cost and all(c["cost"] > 0 for c in e.fact_cost)
    assert e.request_end_time >= e.request_start_time > 0
    assert e.registry_name == "er"
    assert json.loads(e.json_request)["cube"] == "lineitem_stats"


def test_failed_request_still_logged(logged_engine):
    eng, sink = logged_engine
    bad = dict(REQ, selectFields=[{"field": "No Such Field"}])
    with pytest.raises(Exception):
        eng.execute(json.dumps(bad), schema="internal", request_id="rid-2")
    assert len(sink.entries) == 1
    e = sink.entries[0]
    assert e.request_id == "rid-2"
    assert e.status == 400
    assert "No Such Field" in e.error_message


def test_jsonl_writer_roundtrip(tmp_path, logged_engine):
    eng, _ = logged_engine
    path = str(tmp_path / "requests.jsonl")
    eng.request_logger = JsonlRequestLogWriter(path)
    eng.execute(json.dumps(REQ), schema="internal")
    eng.execute(json.dumps(REQ), schema="internal")
    lines = [json.loads(ln) for ln in open(path)]
    assert len(lines) == 2
    assert lines[0]["cube"] == "lineitem_stats"
    assert lines[0]["request_id"] != lines[1]["request_id"]  # generated ids


def test_multi_writer_isolates_failures():
    class Boom:
        def log(self, e):
            raise RuntimeError("colo down")

        def close(self):
            pass

    ok = CollectingRequestLogWriter()
    multi = MultiRequestLogWriter(Boom(), ok)
    multi.log(RequestLogEntry(request_id="r", json_request="{}"))
    assert len(ok.entries) == 1
    assert multi.errors and "colo down" in multi.errors[0]


def test_validate_rejects_blank_request_id():
    sink = CollectingRequestLogWriter()
    with pytest.raises(ValueError):
        sink.log(RequestLogEntry(request_id="", json_request="{}"))


def test_rest_server_logs_requests(tmp_path, spark, sf_dir):
    import json as _json
    import urllib.request

    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.tpch import build_registry
    from maha_spark.serving.rest import RestServer

    path = str(tmp_path / "rest-requests.jsonl")
    eng = engine_for_dir(spark, build_registry(), sf_dir)
    srv = RestServer(eng, registry_name="maha",
                     request_log_path=path).start()
    try:
        body = _json.dumps(REQ).encode()
        r = urllib.request.Request(
            srv.base_url + "/registry/maha/schemas/internal/query",
            data=body, headers={"Content-Type": "application/json",
                                "Request-Id": "wire-1",
                                "User-Id": "alice"}, method="POST")
        with urllib.request.urlopen(r, timeout=120) as resp:
            assert resp.status == 200
    finally:
        srv.stop()
        eng.request_logger = None
    entries = [json.loads(ln) for ln in open(path)]
    assert entries[0]["request_id"] == "wire-1"
    assert entries[0]["user_id"] == "alice"
    assert entries[0]["status"] == 200


def test_parse_failure_still_logged_with_payload_peek(logged_engine):
    """Malformed request JSON fails BEFORE a ReportingRequest exists; the
    ledger must still get a skeleton entry (logFailed parity), with
    cube/requestType peeked tolerantly from the raw payload."""
    eng, sink = logged_engine
    raw = json.dumps({"cube": "lineitem_stats", "requestType": "SyncRequest",
                      "selectFields": "not-a-list"})
    with pytest.raises(Exception):
        eng.execute(raw, schema="internal", request_id="rid-parse")
    assert len(sink.entries) == 1
    e = sink.entries[0]
    assert e.request_id == "rid-parse"
    assert e.status == 400
    assert e.cube == "lineitem_stats"


def test_runtime_failure_logged_as_500(logged_engine, monkeypatch):
    """Engine/planner failures on a VALID request are server errors (500),
    not client errors — reference GeneralError handling."""
    eng, sink = logged_engine

    def boom(model):
        raise RuntimeError("executor lost")

    monkeypatch.setattr(eng.planner, "build", boom)
    with pytest.raises(RuntimeError):
        eng.execute(json.dumps(REQ), schema="internal", request_id="rid-500")
    assert sink.entries[-1].status == 500


def test_proto_record_roundtrip(tmp_path, logged_engine):
    """MahaRequestProto wire parity (request-log/src/proto/
    MahaRequestLog.proto): the proto writer's length-prefixed records
    decode back to the logged entry's fields at the reference's field
    numbers."""
    from maha_spark.core.protowire import _read_uvarint, decode_fields, _first, _s
    from maha_spark.log import ProtoRequestLogWriter

    eng, sink = logged_engine
    path = str(tmp_path / "reqlog.pb")
    eng.request_logger = ProtoRequestLogWriter(path)
    eng.execute(json.dumps(REQ), schema="internal", request_id="rid-pb")

    data = open(path, "rb").read()
    ln, i = _read_uvarint(data, 0)
    f = decode_fields(data[i:i + ln])
    assert _s(f, 1) == "rid-pb"
    assert _s(f, 4) == "lineitem_stats"
    assert _first(f, 7, 0) == 0          # SYNC
    assert _first(f, 15) == 200          # status
    assert _s(f, 9) == "lineitem"        # drivingTable
    sort_cols = [decode_fields(v) for _wt, v in f.get(29, [])]
    assert [( _s(s, 1), _first(s, 2, 0)) for s in sort_cols] == \
        [("Revenue", 1)]                 # DESC = 1
    costs = [decode_fields(v) for _wt, v in f.get(31, [])]
    assert costs and all(_first(c, 3, 0) > 0 for c in costs)


def test_operational_parameters_threaded_into_log(logged_engine):
    """Labels / Job-Name / RegistryName / HostName ride
    additionalParameters (Request.scala:135-166, case-insensitive names)
    and must land in the log record, overriding the service-level
    registry/host defaults — MahaRequestLogHelper parity."""
    eng, sink = logged_engine
    req = dict(REQ)
    req["additionalParameters"] = {
        "Labels": ["nightly", "tier1"],
        "job-name": "revenue-report",          # case-insensitive key
        "RegistryName": "er-override",
        "HostName": "gw-7.example.internal",
    }
    eng.execute(json.dumps(req), schema="internal", request_id="rid-par")
    e = sink.entries[-1]
    assert e.labels == ["nightly", "tier1"]
    assert e.job_name == "revenue-report"
    assert e.registry_name == "er-override"   # beats engine default "er"
    assert e.hostname == "gw-7.example.internal"

    # absent params: service defaults stand
    eng.execute(json.dumps(REQ), schema="internal", request_id="rid-def")
    d = sink.entries[-1]
    assert d.labels == [] and d.job_name == ""
    assert d.registry_name == "er" and d.hostname


def test_proto_carries_job_name_and_labels(tmp_path, logged_engine):
    """jobName=41 and repeated labels=57 at the reference's proto field
    numbers (MahaRequestLog.proto:76,97)."""
    from maha_spark.core.protowire import _read_uvarint, decode_fields, _s
    from maha_spark.log import ProtoRequestLogWriter

    eng, sink = logged_engine
    path = str(tmp_path / "reqlog_jl.pb")
    eng.request_logger = ProtoRequestLogWriter(path)
    req = dict(REQ)
    req["additionalParameters"] = {"Labels": ["a", "b"], "Job-Name": "jn"}
    eng.execute(json.dumps(req), schema="internal", request_id="rid-jl")

    data = open(path, "rb").read()
    ln, i = _read_uvarint(data, 0)
    f = decode_fields(data[i:i + ln])
    assert _s(f, 41) == "jn"
    assert [v.decode() for _wt, v in f.get(57, [])] == ["a", "b"]
