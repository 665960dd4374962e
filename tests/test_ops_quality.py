"""Semantic tests for the repetition / contamination / as-of operators on
hand-crafted inputs (the driver's oracle gate covers the sf0.01 corpus;
these pin the per-row math on cases small enough to verify by hand)."""

from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")


def test_repetition_signals(spark, monkeypatch, tmp_path):
    from maha_spark.ops import text as T

    docs = _docs(spark, [
        "a b a b a b a b",          # 0: one 2-gram dominates
        "q w e r t y u i o p",      # 1: all grams unique
        "x",                        # 2: too short for any gram
    ])
    from maha_spark.ops import common as OC
    monkeypatch.setattr(
        OC, "load_table", lambda _s, _d, _n: docs, raising=True)
    out = {r["doc_id"]: r.asDict()
           for r in T.text_repetition(spark, str(tmp_path)).collect()}

    # doc 0: 7 bigrams, 'a b' occurs 4x -> top2 = 4/7; 4 5-grams, two
    # distinct ('a b a b a' x2, 'b a b a b' x2) -> dup5 = 2/4
    assert out[0]["top2_frac"] == pytest.approx(4 / 7, abs=1e-6)
    assert out[0]["dup5_frac"] == pytest.approx(0.5, abs=1e-6)
    assert out[0]["is_repetitive"] == 1
    # doc 1: everything unique
    assert out[1]["top2_frac"] == pytest.approx(1 / 9, abs=1e-6)
    assert out[1]["dup5_frac"] == 0.0
    assert out[1]["is_repetitive"] == 0
    # doc 2: no grams at all -> zero fractions, still present
    assert out[2]["n_words"] == 1
    assert out[2]["top2_frac"] == 0.0
    assert out[2]["dup8_frac"] == 0.0


def test_contamination_hits(spark, monkeypatch, tmp_path):
    from maha_spark.ops import contamination as C

    bench_text = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [
        bench_text,                                    # 0: benchmark split
        "one two three four five six seven eight x y", # 1: 1 shared shingle
        "p q r s t u v w x y z",                       # 2: clean
    ])
    monkeypatch.setattr(
        C, "load_table", lambda _s, _d, _n: docs, raising=True)
    out = {r["doc_id"]: r.asDict()
           for r in C.contamination(spark, str(tmp_path)).collect()}

    assert 0 not in out  # benchmark split excluded from the report
    # doc 1: 3 distinct 8-shingles, exactly one ('one..eight') in bench
    assert out[1]["n_shingles"] == 3
    assert out[1]["n_hit"] == 1
    assert out[1]["is_contaminated"] == 1
    assert out[1]["contaminated_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[2]["n_hit"] == 0
    assert out[2]["is_contaminated"] == 0


def test_asof_join_semantics(spark, monkeypatch, tmp_path):
    from maha_spark.ops import asof as A

    orders = spark.createDataFrame(
        [(100, 7, "O", 10.0, "2020-01-01 00:00:00", "1-URGENT"),
         (200, 7, "O", 20.0, "2020-01-05 00:00:00", "1-URGENT"),
         # two orders at the same instant: max orderkey must win
         (301, 7, "O", 31.0, "2020-01-05 00:00:00", "1-URGENT"),
         (400, 8, "O", 40.0, "2020-06-01 00:00:00", "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string"
    ).selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "CAST(o_orderdate AS TIMESTAMP_NTZ) AS o_orderdate",
                 "o_orderpriority")
    events = spark.createDataFrame(
        [(1, "2019-12-31 23:59:59", 7),   # before any order -> null
         (2, "2020-01-05 00:00:00", 7),   # equal instant -> inclusive match
         (3, "2020-02-01 12:00:00", 7),   # after both -> latest (301)
         (4, "2020-01-01 00:00:00", 9)],  # user with no orders -> null
        "event_id long, ts string, user_id long"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id",
                 "'click' AS event_type", "0.0 AS value", "'' AS props")

    tables = {"events": events, "orders": orders}
    monkeypatch.setattr(A, "load_table",
                        lambda _s, _d, name: tables[name], raising=True)
    out = {r["event_id"]: r.asDict()
           for r in A.asof_join(spark, str(tmp_path)).collect()}

    assert out[1]["order_key"] is None and out[1]["order_price"] is None
    assert out[2]["order_key"] == 301 and out[2]["order_price"] == 31.0
    assert out[3]["order_key"] == 301
    assert out[4]["order_key"] is None


def test_chunk_documents_matches_oracle(spark, sf_dir, duck):
    """Fixed-token windows with overlap: exact hash-match against the
    DuckDB oracle (tokens, starts, fingerprints, text), full coverage of
    every document, and correct overlap between consecutive chunks."""
    from maha_spark.ops.chunking import (CHUNK_OVERLAP, CHUNK_TOKENS,
                                         chunk_documents,
                                         chunk_documents_oracle)

    got = chunk_documents(spark, sf_dir).toPandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    want = duck.execute(chunk_documents_oracle()).fetchdf() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for col in ("doc_id", "chunk_id", "start_tok", "n_tok", "chunk_fp"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col

    # every document chunked
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert got["doc_id"].nunique() == n_docs

    # overlap semantics at a window size the fixture docs exceed:
    # consecutive chunks share exactly `overlap` tokens
    small = chunk_documents(spark, sf_dir, chunk_tokens=16, overlap=4)         .toPandas().sort_values(["doc_id", "chunk_id"])
    multi = small[small.duplicated("doc_id", keep=False)]
    assert len(multi) > 0
    one = multi[multi.doc_id == multi.doc_id.iloc[0]]
    a = one[one.chunk_id == 0].chunk_text.iloc[0].split()
    b = one[one.chunk_id == 1].chunk_text.iloc[0].split()
    assert a[12:] == b[:4]
    want_small = duck.execute(
        chunk_documents_oracle(chunk_tokens=16, overlap=4)).fetchdf()
    assert len(small) == len(want_small)


def test_gram_rows_empty_docs_and_width_one(spark):
    """ADVICE r12 (low): Spark's sequence(1, 0) steps DOWN to [1, 0],
    so an unguarded position explode emitted stray (i=1, i=0) rows for
    empty word arrays — harmless for widths >= 2 (range-filtered) but
    slice(w, 0, 1) THREW for a width of 1. The guarded explode is total:
    empty docs yield no rows and width 1 yields exactly the words."""
    from maha_spark.ops.text import gram_rows_spark

    base = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, []), (3, ["x"])],
        "doc_id long, w array<string>")
    got = {(r.doc_id, r.n, r.gram)
           for r in gram_rows_spark(base, {1, 2}).collect()}
    assert got == {
        (1, 1, "a"), (1, 1, "b"), (1, 1, "c"),
        (1, 2, "a b"), (1, 2, "b c"),
        (3, 1, "x"),
    }
