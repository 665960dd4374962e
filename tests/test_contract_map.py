"""Contract-map freshness: the README table is generated from the live
registries, and the contract/pytest-only split is total and disjoint —
a rotation can't silently orphan (or double-book) an operator."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_table_is_fresh():
    from tools.gen_contract_map import BEGIN, END, render
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    assert BEGIN in text and END in text, (
        "README.md lost the generated contract-map section — run "
        "python tools/gen_contract_map.py --write")
    current = text[text.index(BEGIN):text.index(END) + len(END)]
    assert current == render(), (
        "README contract map is stale — run "
        "python tools/gen_contract_map.py --write")


def test_contract_is_52_entries_and_split_is_disjoint():
    import __spark_entry__ as entry
    from maha_spark.ops import entry_queries, pytest_only_ops

    queries = entry.queries()
    # r13: the declared set grew to 52 (q16_union_view + q32_avg_rollup
    # restored per the r12 verdict) and is FROZEN — a declared entry must
    # never disappear again; growth is the only allowed change
    assert len(queries) == 52, len(queries)

    ops = set(entry_queries())
    aside = set(pytest_only_ops())
    both = {f"op_{n}" for n in aside} & ops | (aside & ops)
    assert not both, f"double-booked (contract AND pytest-only): {both}"

    # every oracle key corresponds to a query entry
    dangling = set(entry.oracle_sql()) - set(queries)
    assert not dangling, f"oracle_sql without queries(): {dangling}"


def test_pytest_only_ops_are_callable():
    """Each aside-registry operator resolves to a real callable with the
    (spark, sf_dir) signature family — a renamed/removed function breaks
    here, not in a stale doc table."""
    from maha_spark.ops import pytest_only_ops
    for name, (fn, test) in pytest_only_ops().items():
        assert callable(fn), name
        assert test, name
