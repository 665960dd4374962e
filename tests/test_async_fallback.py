"""Async report sink + job status, and fallback re-planning."""

from __future__ import annotations

import csv
import glob
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAY_ALL = {"field": "day", "operator": "between",
           "from": "1995-01-01", "to": "2002-12-31"}


@pytest.fixture(scope="module")
def contract_engine(spark):
    from maha_spark.engine import engine_for_dir
    from maha_spark.examples.contract import build_contract_registry
    return engine_for_dir(spark, build_contract_registry(),
                          "/root/testdata/sf0.001")


def test_async_csv_report(contract_engine, tmp_path, duck):
    from maha_spark.execution.async_reports import AsyncReportRunner
    runner = AsyncReportRunner(contract_engine, str(tmp_path))
    job = runner.submit({
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}, {"field": "revenue"}],
        "filterExpressions": [DAY_ALL],
    }, output_format="csv")
    assert job.status == "COMPLETED", job.error
    n_flags = duck.execute(
        "SELECT COUNT(DISTINCT l_returnflag) FROM lineitem").fetchone()[0]
    assert job.rows == n_flags
    files = glob.glob(os.path.join(job.output_path, "*.csv"))
    assert len(files) == 1
    with open(files[0]) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["return_flag", "revenue"]
    assert len(rows) == n_flags + 1
    # status ledger persisted
    with open(os.path.join(str(tmp_path),
                           f"{job.job_id}.status.json")) as f:
        assert json.load(f)["status"] == "COMPLETED"


def test_async_failure_recorded(contract_engine, tmp_path):
    from maha_spark.execution.async_reports import AsyncReportRunner
    runner = AsyncReportRunner(contract_engine, str(tmp_path))
    job = runner.submit({"cube": "no_such_cube",
                         "selectFields": [{"field": "x"}]})
    assert job.status == "FAILED"
    assert job.error


def test_fallback_revision(spark):
    """Empty primary result falls back to the configured revision."""
    from maha_spark.core.types import IntType, StrType, DecType
    from maha_spark.core.columns import DimCol, FactCol, DerivedFactCol
    from maha_spark.engine import MahaSparkEngine
    from maha_spark.plans.binding import TableBinding
    from maha_spark.registry.cube import (
        FactTable, PubCol, PublicFact, Registry,
    )
    import pyspark.sql.functions as F

    cols = {
        "k": DimCol("k", StrType()),
        "v_dec": FactCol("v_dec", DecType(), expr="CAST({v} AS DECIMAL(10,2))",
                         depends_on=("v",)),
        "v": FactCol("v", DecType()),
        "total": DerivedFactCol("total", DecType(),
                                expr="CAST({v_dec} AS DOUBLE)"),
    }
    reg = Registry()
    for rev, tbl in ((0, "empty_t"), (1, "full_t")):
        reg.register_fact(PublicFact(
            name="fb", revision=rev,
            tables=[FactTable(name=tbl, columns=dict(cols))],
            pub_cols=[PubCol("k", "k")],
            pub_fact_cols=[PubCol("total", "total")],
            require_day_filter=False), default=(rev == 0))

    binding = TableBinding(spark)
    full = spark.createDataFrame([("a", 1.5), ("b", 2.5)], "k string, v double")
    binding.bind("empty_t", lambda: full.filter(F.lit(False)))
    binding.bind("full_t", lambda: full)
    eng = MahaSparkEngine(spark, reg, binding)

    req = {"cube": "fb", "selectFields": [{"field": "k"}, {"field": "total"}]}
    assert eng.dataframe(req).count() == 0  # primary (rev 0) is empty
    out = eng.dataframe_with_fallback(req, fallback_revision=1)
    assert {r["k"] for r in out.collect()} == {"a", "b"}


def test_fallback_reraises_validation_error(contract_engine):
    """A malformed request must surface its 400 — silently re-planning it
    against the fallback revision would mask the caller's error (the
    reference's fallback fires only on pipeline failure)."""
    import pytest
    from maha_spark.request.request import ValidationError

    bad = {"cube": "tpch",
           "selectFields": [{"field": "no_such_alias"}],
           "filterExpressions": [{"field": "day", "operator": "between",
                                  "from": "1995-01-01", "to": "1995-01-31"}]}
    with pytest.raises(ValidationError):
        contract_engine.dataframe_with_fallback(bad, fallback_revision=0)


def _read_xlsx_rows(data: bytes) -> list[list]:
    """Stdlib OOXML reader: unzip, parse sheet1, return typed cell values."""
    import io
    import zipfile
    import xml.etree.ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        tree = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    out = []
    for row in tree.iter(f"{ns}row"):
        vals = []
        for c in row.iter(f"{ns}c"):
            if c.get("t") == "inlineStr":
                vals.append(c.find(f"{ns}is/{ns}t").text)
            else:
                v = c.find(f"{ns}v").text
                vals.append(float(v) if "." in v else int(v))
        out.append(vals)
    return out


def test_async_excel_report_roundtrip(contract_engine, tmp_path):
    """ReportFormatType.ExcelFormat parity (Request.scala:121-127): the
    excel sink writes a valid OOXML workbook whose header + typed rows
    round-trip through an independent stdlib reader, faithful to the
    engine's own result (value correctness of the query itself is the
    driver oracle's job)."""
    from maha_spark.execution.async_reports import AsyncReportRunner
    req = {
        "cube": "tpch",
        "selectFields": [{"field": "return_flag"}, {"field": "revenue"}],
        "filterExpressions": [DAY_ALL],
        "sortBy": [{"field": "return_flag", "order": "ASC"}],
    }
    expected = [[r[0], float(r[1])]
                for r in contract_engine.dataframe(req).collect()]
    runner = AsyncReportRunner(contract_engine, str(tmp_path))
    job = runner.submit(req, output_format="excel")
    assert job.status == "COMPLETED", job.error
    files = glob.glob(os.path.join(job.output_path, "*.xlsx"))
    assert len(files) == 1
    with open(files[0], "rb") as f:
        rows = _read_xlsx_rows(f.read())
    assert rows[0] == ["return_flag", "revenue"]
    assert len(rows) == len(expected) + 1
    for got, want in zip(rows[1:], expected):
        assert got[0] == want[0]
        assert abs(got[1] - want[1]) < 1e-9
