"""Cube queries rotated OFF the driver contract keep their
DuckDB-oracle pins here (examples/contract.OFFCONTRACT_QUERIES) — a
rotation frees a contract slot but never loses coverage."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maha_spark.examples import contract  # noqa: E402


@pytest.mark.parametrize("name", sorted(contract.OFFCONTRACT_QUERIES))
def test_offcontract_query_matches_duckdb(spark, duck, sf_dir, name):
    from tests.test_ops_packing import _match
    df = contract.run_query(spark, sf_dir, name)
    _match(df, contract.OFFCONTRACT_QUERIES[name]["sql"], duck)
    assert df.count() > 0


def test_offcontract_disjoint_from_contract():
    assert not set(contract.OFFCONTRACT_QUERIES) & set(contract.QUERIES)
