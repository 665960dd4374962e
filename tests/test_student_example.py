"""End-to-end student example (reference api-example /
MahaServiceExampleTest requests) over inline DataFrames."""

from __future__ import annotations

import pytest

DAY = {"field": "Day", "operator": "between",
       "from": "2020-01-01", "to": "2020-01-31"}


@pytest.fixture(scope="module")
def student_engine(spark):
    from maha_spark.engine import MahaSparkEngine
    from maha_spark.examples.student import build_student_registry
    from maha_spark.plans.binding import TableBinding

    import datetime as dt

    def d(s):
        return dt.date.fromisoformat(s)

    grades = spark.createDataFrame(
        [  # class, student, section, year, comment, date, total, obtained
            (100, 213, 1, 1, "", d("2020-01-10"), 100, 80),
            (100, 213, 1, 1, "", d("2020-01-11"), 100, 95),
            (101, 213, 2, 1, "", d("2020-01-12"), 50, 0),
            (100, 214, 1, 2, "", d("2020-01-10"), 100, 60),
            (100, 215, 1, 4, "", d("2020-01-10"), 0, 0),   # safe divide
            (100, 216, 1, 9, "", d("2020-01-10"), 100, 10),  # Year -> Other
        ],
        "class_id long, student_id long, section_id long, year long, "
        "comment string, date date, total_marks long, obtained_marks long")
    students = spark.createDataFrame(
        [(213, "Alice", 1, 2019, "ACTIVE"),
         (214, "Bob", 1, 2018, "ACTIVE"),
         (215, "Carol", 2, 2016, "ACTIVE"),
         (216, "Mallory", 2, 2016, "DELETED")],
        "id long, name string, department_id long, admitted_year long, "
        "status string")

    binding = TableBinding(spark)
    binding.bind("student_grade_sheet", lambda: grades)
    binding.bind("student", lambda: students)
    return MahaSparkEngine(spark, build_student_registry(), binding)


def _rows(out):
    return [tuple(r) for r in out["rows"]]


def test_example_request_student_marks(student_engine):
    """MahaServiceExampleTest.scala:36-48: Student ID + Marks Obtained,
    = filter, ascending metric sort."""
    out = student_engine.execute({
        "cube": "student_performance",
        "selectFields": [{"field": "Student ID"},
                         {"field": "Marks Obtained"}],
        "filterExpressions": [
            DAY, {"field": "Student ID", "operator": "=", "value": "213"}],
        "sortBy": [{"field": "Marks Obtained", "order": "ASC"}],
    }, schema="student")
    assert _rows(out) == [(213, 175)]


def test_multi_dim_select(student_engine):
    """MahaServiceExampleTest.scala:59-70 shape."""
    out = student_engine.execute({
        "cube": "student_performance",
        "selectFields": [{"field": "Student ID"}, {"field": "Class ID"},
                         {"field": "Section ID"},
                         {"field": "Total Marks"}],
        "filterExpressions": [
            DAY, {"field": "Student ID", "operator": "=", "value": "213"}],
    }, schema="student")
    assert sorted(_rows(out)) == [(213, 100, 1, 200), (213, 101, 2, 50)]


def test_year_enum_and_safe_divide(student_engine):
    out = student_engine.execute({
        "cube": "student_performance",
        "selectFields": [{"field": "Year"},
                         {"field": "Performance Factor"}],
        "filterExpressions": [
            DAY, {"field": "Student ID", "operator": "in",
                  "values": ["213", "215", "216"]}],
    }, schema="student")
    got = dict(_rows(out))
    assert got["Freshman"] == pytest.approx(0.7)   # (80+95+0)/(100+100+50)
    assert got["Senior"] == 0.0                    # 0 /- 0 safe divide
    # Mallory (year=9 -> Other) is DELETED: the forced status filter
    # drops her rows entirely
    assert "Other" not in got


def test_forced_status_filter_is_overridable(student_engine):
    out = student_engine.execute({
        "cube": "student_performance",
        "selectFields": [{"field": "Year"}, {"field": "Marks Obtained"}],
        "filterExpressions": [
            DAY,
            {"field": "Student ID", "operator": "in", "values": ["216"]},
            {"field": "Student Status", "operator": "in",
             "values": ["DELETED"]}],
    }, schema="student")
    assert _rows(out) == [("Other", 10)]


def test_student_schema_requires_id_filter(student_engine):
    from maha_spark.request.request import ValidationError
    with pytest.raises(ValidationError, match="Student ID"):
        student_engine.execute({
            "cube": "student_performance",
            "selectFields": [{"field": "Total Marks"}],
            "filterExpressions": [DAY],
        }, schema="student")


def test_dim_join_brings_student_name(student_engine):
    out = student_engine.execute({
        "cube": "student_performance",
        "selectFields": [{"field": "Student Name"},
                         {"field": "Marks Obtained"}],
        "filterExpressions": [
            DAY, {"field": "Student ID", "operator": "in",
                  "values": ["213", "214"]}],
    }, schema="student")
    assert sorted(_rows(out)) == [("Alice", 175), ("Bob", 60)]


def test_admitted_year_hidden_from_domain(student_engine):
    fields = [f["field"] for c in
              student_engine.registry.domain_json()["cubes"].values()
              for f in c["fields"]]
    assert "Admitted Year" not in fields
    assert "Student Name" not in fields  # dim attrs listed per dimension