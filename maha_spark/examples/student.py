"""The reference's api-example student cube, re-registered.

Mirrors ``api-example/.../student/SampleSchemaRegistrationFactory.scala``
(:35-99) — the smallest real cube the reference ships (its H2 end-to-end
example): fact ``student_grade_sheet`` with the Year enum mapping and the
``Performance Factor`` safe-divide metric, dimension ``student`` with the
StudentSchema-required ``Student ID`` filter, a hidden-from-JSON column,
and the high-cardinality ``Student Status NOT IN (DELETED)`` guard
(applied here as an overridable cube forced filter).

Physical tables are whatever the caller binds (``TableBinding.bind``) —
the e2e test feeds inline DataFrames, a deployment points at parquet.
"""

from __future__ import annotations

from ..core.columns import DerivedFactCol, DimCol, FactCol
from ..core.filters import (IN_BETWEEN_EQUALITY, NotInFilter,
                            IN_NOTIN_BETWEEN_EQUALITY)
from ..core.grain import DAILY
from ..core.types import DateType, DecType, IntType, StaticMapping, StrType
from ..registry.cube import (DimensionTable, FactTable, PubCol,
                             PublicDimension, PublicFact, Registry)

YEAR_MAPPING = StaticMapping(
    {1: "Freshman", 2: "Sophomore", 3: "Junior", 4: "Senior"}, "Other")


def build_student_registry() -> Registry:
    reg = Registry()

    student = DimensionTable(
        name="student", primary_key="id", level=1, cardinality=100_000,
        schema_col_map={"student": "id"},
        columns={
            "id": DimCol("id", IntType()),
            "name": DimCol("name", StrType()),
            "department_id": DimCol("department_id", IntType()),
            "admitted_year": DimCol("admitted_year", IntType()),
            "status": DimCol("status", StrType()),
        })
    reg.register_dimension(PublicDimension(
        name="student", table=student,
        pub_cols=[
            PubCol("Student ID", "id", IN_NOTIN_BETWEEN_EQUALITY),
            PubCol("Student Name", "name", IN_NOTIN_BETWEEN_EQUALITY),
            PubCol("Admitted Year", "admitted_year",
                   IN_NOTIN_BETWEEN_EQUALITY, hidden_from_json=True),
            PubCol("Student Status", "status", IN_NOTIN_BETWEEN_EQUALITY),
        ]))

    fact_cols = {
        "class_id": DimCol("class_id", IntType()),
        "student_id": DimCol("student_id", IntType(),
                             foreign_key="student"),
        "section_id": DimCol("section_id", IntType()),
        "year": DimCol("year", IntType(static_mapping=YEAR_MAPPING)),
        "comment": DimCol("comment", StrType()),
        "date": DimCol("date", DateType(), is_day_column=True),
        "total_marks": FactCol("total_marks", IntType()),
        "obtained_marks": FactCol("obtained_marks", IntType()),
        # "{obtained_marks}" /- "{total_marks}" (safe divide)
        "performance_factor": DerivedFactCol(
            "performance_factor", DecType(length=10, scale=2),
            expr=("CASE WHEN {total_marks} = 0 THEN 0.0 ELSE "
                  "ROUND(CAST({obtained_marks} AS DOUBLE) / "
                  "{total_marks}, 2) END")),
    }
    grade_sheet = FactTable(
        name="student_grade_sheet", columns=fact_cols, grain=DAILY,
        day_column="date", cost=400,
        # highCardinalityFilters on the student dim in the reference;
        # the engine's overridable forced-filter slot carries it
        forced_filters=[])

    reg.register_fact(PublicFact(
        name="student_performance",
        tables=[grade_sheet],
        pub_cols=[
            PubCol("Class ID", "class_id", IN_NOTIN_BETWEEN_EQUALITY),
            PubCol("Student ID", "student_id", IN_NOTIN_BETWEEN_EQUALITY),
            PubCol("Section ID", "section_id", IN_NOTIN_BETWEEN_EQUALITY),
            PubCol("Day", "date", IN_BETWEEN_EQUALITY),
            PubCol("Year", "year", IN_NOTIN_BETWEEN_EQUALITY),
            PubCol("Remarks", "comment"),
        ],
        pub_fact_cols=[
            PubCol("Total Marks", "total_marks",
                   IN_NOTIN_BETWEEN_EQUALITY),
            PubCol("Marks Obtained", "obtained_marks",
                   IN_NOTIN_BETWEEN_EQUALITY),
            PubCol("Performance Factor", "performance_factor",
                   IN_NOTIN_BETWEEN_EQUALITY),
        ],
        schema_required_alias={"student": "Student ID"},
        forced_filters=[NotInFilter(field="Student Status",
                                    values=("DELETED",),
                                    is_overridable=True)],
        max_days_window=400, max_days_lookback=9999,
        day_alias="Day"))
    return reg
