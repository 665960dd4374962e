"""Exact-substring duplicate spans — exhaustive verbatim-passage
detection and keep-first removal (Lee, Ippolito, Nystrom, Zhang, Eck,
Callison-Burch, Carlini: "Deduplicating Training Data Makes Language
Models Better", ACL'22 — the ExactSubstr dedup).

Relation to the winnowing family (``ops/winnow.py``): winnowing SAMPLES
~2/(w+1) of the k-gram windows (a fingerprint signature scored by
containment — a similarity measure), while ExactSubstr keeps EVERY
window, so it finds each individual duplicated passage exactly, merges
overlapping hits into maximal spans, and can therefore *remove* the
duplicate text rather than merely flag document pairs.  The paper's
suffix-array formulation is a shared-memory algorithm; the distributed
re-expression here is the standard window-hash equivalent: a length-L
word window appears more than once in the corpus iff its hash value
occurs at more than one (doc, pos) — a groupBy, not a suffix sort.

Pipeline (all whole-stage codegen, TWO shuffles, no self-join):

1. hash every L-word window per document (``transform`` over an index
   ``sequence`` — per-row codegen, zero shuffle);
2. Generate-safe explode to ``(doc_id, pos, h)``;
3. corpus-wide occurrence count per hash via a window aggregate
   (shuffle keyed on ``h``); windows with >= 2 occurrences are
   duplicates — *within-document* repeats count, matching the paper's
   "appears more than once in the corpus";
4. merge each document's duplicated windows into maximal spans
   (gaps-and-islands over a per-document window — shuffle keyed on
   ``doc_id``): windows at ``pos`` cover words ``[pos, pos+L-1]``;
   runs whose covered ranges overlap or touch collapse to one span.

100 TB judgment: rows stay LINEAR in corpus token count end-to-end —
there is no candidate-pair join, so the boilerplate/hot-bucket failure
mode of the signature family cannot occur here (a window duplicated N
times contributes N rows, never N^2).  The two shuffles are keyed on a
60-bit hash and on doc_id respectively — both well-distributed.  The
explode multiplies rows by ~words-per-doc; at web scale that is the
same volume every shingle-based op in this package already shuffles.

Hash width: 60 bits (``h60_sql``), not the 32 bits the sampled
winnowing signatures use — exhaustive windowing hashes EVERY position,
so a 32-bit space would produce guaranteed birthday false-duplicates
beyond ~2^16 distinct windows; 2^60 pushes that past 2^30 windows.
A false positive removes a non-duplicated span (quality loss, not
correctness loss); callers needing certainty can re-verify surviving
spans against the raw k-grams.

No reference analogue: the reference engine (yahoo/maha) has no corpus
dedup surface; this op belongs to the training-data-pipeline axis of
the brief, next to ``ops/winnow.py`` and ``ops/dedup.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import (duck_h60_sql, duck_words_sql, h60_sql, load_table,
                     scoped_cache, words_sql)

#: duplicated-window length in words — the minimum verbatim run the
#: detector reports (the paper uses 50 BPE tokens at web scale; the
#: module default matches winnowing's guarantee threshold w+k-1 = 8 so
#: the two detectors are comparable on the same corpus)
EXSUB_L = 8


def _window_hashes(docs: DataFrame, length: int) -> DataFrame:
    """``(doc_id, pos, h)`` — one row per L-word window (1-based word
    index). Documents shorter than ``length`` words emit nothing.

    The explode follows the Generate-safe pattern: the generator
    iterates a cheap ``sequence(1, size(hs))`` while the computed ``hs``
    array passes through the Generate as requiredChildOutput (evaluated
    once per input row), and the element is projected after."""
    gram = f"concat_ws(' ', slice(w, i, {length}))"
    return (docs.selectExpr("doc_id", f"{words_sql()} AS w")
            .filter(f"size(w) >= {length}")
            .selectExpr(
                "doc_id",
                f"transform(sequence(1, size(w) - {length} + 1), "
                f"i -> {h60_sql(gram)}) AS hs")
            .selectExpr("doc_id", "hs",
                        "explode(sequence(1, size(hs))) AS pos")
            .selectExpr("doc_id", "pos", "hs[pos - 1] AS h"))


def _merge_spans(dup: DataFrame, length: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated window positions
    ``(doc_id, pos)`` into maximal spans: a window extends the current
    span iff its covered range ``[pos, pos+L-1]`` overlaps or touches
    the previous window's range — i.e. ``pos - prev_pos <= L``."""
    seq = Window.partitionBy("doc_id").orderBy("pos")
    return (dup
            .withColumn("prev", F.lag("pos").over(seq))
            .withColumn(
                "new_span",
                F.when(F.col("prev").isNull() |
                       (F.col("pos") - F.col("prev") > length), 1)
                .otherwise(0))
            .withColumn("island", F.sum("new_span").over(
                seq.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("doc_id", "island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + F.lit(length - 1)).alias("span_end"),
                 F.count(F.lit(1)).alias("n_windows"))
            .drop("island"))


def exact_substring_spans_frame(docs: DataFrame,
                                length: int = EXSUB_L) -> DataFrame:
    """Maximal duplicated spans: ``(doc_id, span_start, span_end,
    n_windows)`` — 1-based inclusive WORD indexes of every maximal run
    of text whose length->L windows all appear elsewhere in the corpus
    (or again in the same document), plus how many duplicated windows
    the span merged. All-integer output (hash-stable across engines).
    """
    occ = Window.partitionBy("h")
    dup = (_window_hashes(docs, length)
           .withColumn("occ", F.count(F.lit(1)).over(occ))
           .filter("occ >= 2")
           .select("doc_id", "pos"))
    return _merge_spans(dup, length).orderBy("doc_id", "span_start")


def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: duplicated spans over the ``documents``
    table at the module default window length."""
    return exact_substring_spans_frame(
        load_table(spark, sf_dir, "documents"))


def exact_substring_spans_oracle(length: int = EXSUB_L) -> str:
    """DuckDB twin of ``exact_substring_spans`` over the ``documents``
    view: 1-based inclusive list slices (``w[i:i+L-1]`` == Spark
    ``slice(w, i, L)``), exclusive-end ``range`` == Spark ``sequence``,
    the same md5-derived 60-bit hash, and the same window-function
    islands — all-integer output, bit-equal."""
    gram = f"array_to_string(w[i:i+{length}-1], ' ')"
    return f"""
        WITH wd AS (
            SELECT doc_id, {duck_words_sql()} AS w FROM documents
        ),
        g AS (
            SELECT doc_id,
                   list_transform(range(1, len(w) - {length} + 2),
                                  i -> {duck_h60_sql(gram)}) AS hs
            FROM wd WHERE len(w) >= {length}
        ),
        e AS (
            SELECT doc_id, pos, hs[pos] AS h
            FROM (SELECT doc_id, hs,
                         unnest(range(1, len(hs) + 1)) AS pos FROM g)
        ),
        dup AS (
            SELECT doc_id, pos
            FROM (SELECT doc_id, pos,
                         count(*) OVER (PARTITION BY h) AS occ FROM e)
            WHERE occ >= 2
        ),
        flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                             OR pos - lag(pos) OVER w > {length}
                        THEN 1 ELSE 0 END AS new_span
            FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS island
            FROM flagged
        )
        SELECT doc_id,
               min(pos) AS span_start,
               max(pos) + {length - 1} AS span_end,
               count(*) AS n_windows
        FROM isl GROUP BY doc_id, island
        ORDER BY doc_id, span_start
    """


def exact_substring_dedup_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (``(spark, sf_dir)`` signature family): keep-first
    removal over the ``documents`` table at the module defaults."""
    return exact_substring_dedup(load_table(spark, sf_dir, "documents"))


def exact_substring_dedup(docs: DataFrame,
                          length: int = EXSUB_L) -> DataFrame:
    """Keep-first ExactSubstr removal: ``(doc_id, clean_text,
    n_words, removed_words)`` with every duplicated window occurrence
    CUT except the corpus-first one per window value (minimum
    ``(doc_id, pos)`` — the deterministic spelling of the paper's
    "remove all but one occurrence").

    Mechanics: rank occurrences per hash (``row_number`` ordered by
    ``(doc_id, pos)``; rank 1 survives), merge each document's doomed
    windows into removal spans exactly like the detection frame, then
    rebuild the text with an index-aware ``filter`` lambda over the word
    array against the (per-document, bounded) span list — per-row
    codegen, no UDF. Rows stay linear throughout; the span list joined
    back to a document is bounded by its own word count.

    Note the non-transitive subtlety the paper accepts: cutting a span
    from a LATER document can split text that would have formed a longer
    duplicated run with a third document — removal is one-shot, not
    iterated to a fixed point (identical to the reference
    implementation's single pass).
    """
    occ = Window.partitionBy("h").orderBy("doc_id", "pos")
    doomed = (_window_hashes(docs, length)
              .withColumn("rn", F.row_number().over(occ))
              .withColumn("occ", F.count(F.lit(1)).over(
                  Window.partitionBy("h")))
              .filter("occ >= 2 AND rn >= 2")
              .select("doc_id", "pos"))
    seq = Window.partitionBy("doc_id").orderBy("pos")
    spans = (doomed
             .withColumn("prev", F.lag("pos").over(seq))
             .withColumn(
                 "new_span",
                 F.when(F.col("prev").isNull() |
                        (F.col("pos") - F.col("prev") > length), 1)
                 .otherwise(0))
             .withColumn("island", F.sum("new_span").over(
                 seq.rowsBetween(Window.unboundedPreceding, 0)))
             .groupBy("doc_id", "island")
             .agg(F.min("pos").alias("s"),
                  (F.max("pos") + F.lit(length - 1)).alias("e"))
             .groupBy("doc_id")
             .agg(F.sort_array(F.collect_list(F.struct("s", "e")))
                  .alias("spans")))
    return (docs.selectExpr("doc_id", f"{words_sql()} AS w")
            .join(spans, "doc_id", "left")
            .selectExpr(
                "doc_id", "w",
                "coalesce(spans, array()) AS spans")
            .selectExpr(
                "doc_id",
                # i is 0-based; word index i+1 is removed when some span
                # [s, e] covers it
                "filter(w, (x, i) -> NOT exists(spans, "
                "p -> i + 1 >= p.s AND i + 1 <= p.e)) AS kept",
                "size(w) AS n_words")
            .selectExpr(
                "doc_id",
                "concat_ws(' ', kept) AS clean_text",
                "n_words",
                "n_words - size(kept) AS removed_words"))


# --------------------------------------------------------------------
# incremental ExactSubstr: persisted window-hash index for crawl ingest
# (the batch twin of ops/incremental.py's persisted LSH index — dedupe
# each arriving batch against the corpus-so-far without re-scanning it)
# --------------------------------------------------------------------
WINDOWS_TABLE = "exsub_windows"


def materialize_exsub_index(spark: SparkSession, docs: DataFrame,
                            dst_dir: str, length: int = EXSUB_L) -> str:
    """Build the corpus window-hash index under ``dst_dir`` (full
    rebuild): every ``(doc_id, pos, h)`` window row, stored columnar.

    Linear in corpus token count — the same volume the one-shot
    detector shuffles, persisted once so each ingest batch pays only
    its own size. At warehouse scale, store it bucketed/partitioned by
    ``pmod(h, N)`` so the per-batch probe prunes to the batch's hash
    buckets; the probe below already column-prunes to ``h``."""
    (_window_hashes(docs, length).write.mode("overwrite")
     .parquet(os.path.join(dst_dir, WINDOWS_TABLE)))
    return dst_dir


def update_exsub_index(spark: SparkSession, index_dir: str,
                       new_docs: DataFrame, length: int = EXSUB_L,
                       assume_new: bool = False) -> None:
    """Fold a new batch's window rows into the index (append). The
    batch's doc_ids must be new to the corpus — same enforced append
    contract as ``ops/incremental.py``: stale + new window rows for one
    re-crawled id would double-count its windows as "duplicates".
    ``assume_new=True`` skips the (column-pruned, footer-cheap) probe
    when ingest mints fresh ids by construction."""
    path = os.path.join(index_dir, WINDOWS_TABLE)
    if not assume_new:
        dup = (new_docs.select("doc_id").distinct()
               .join(spark.read.parquet(path).select("doc_id"),
                     "doc_id", "left_semi")
               .limit(5).collect())
        if dup:
            ids = sorted(r.doc_id for r in dup)
            raise ValueError(
                f"update_exsub_index: doc_ids already indexed: {ids} — "
                "restate re-crawled ids instead of re-appending, or "
                "pass assume_new=True only when ingest guarantees "
                "fresh ids")
    (_window_hashes(new_docs, length).write.mode("append").parquet(path))


def exsub_incremental(spark: SparkSession, index_dir: str,
                      new_docs: DataFrame,
                      length: int = EXSUB_L) -> DataFrame:
    """Duplicated spans WITHIN the new batch's documents, measured
    against (corpus index + the batch itself): a batch window is
    duplicated iff it occurs >= 2 times in the batch or at least once
    in the index. Exactly the one-shot detector's answer over
    (corpus + batch) restricted to batch doc_ids (bit-identity pinned
    in ``tests/test_ops_substring.py``) — corpus-internal spans were
    already reported when the corpus was indexed.

    Scale shape: the batch's distinct hash set is BROADCAST into a
    left-semi probe of the index (one index scan filtered executor-side
    — never a shuffle of the index), and the returned hit set is
    bounded by the batch's own window count. Per-batch cost is
    O(batch) + one pruned index read, independent of corpus size.
    """
    bw = scoped_cache(_window_hashes(new_docs, length))
    hits = (spark.read.parquet(os.path.join(index_dir, WINDOWS_TABLE))
            .select("h")
            .join(F.broadcast(bw.select("h").distinct()), "h", "left_semi")
            .distinct())
    dup = (bw
           .withColumn("occ", F.count(F.lit(1)).over(Window.partitionBy("h")))
           .join(F.broadcast(hits.withColumn("in_idx", F.lit(1))),
                 "h", "left")
           .filter("occ >= 2 OR in_idx IS NOT NULL")
           .select("doc_id", "pos"))
    return _merge_spans(dup, length).orderBy("doc_id", "span_start")


def streaming_exsub_incremental(spark: SparkSession, docs_dir: str,
                                index_dir: str, spans_dir: str,
                                ckpt_dir: str, length: int = EXSUB_L,
                                max_files_per_trigger: int = 1) -> None:
    """Continuous crawl-ingest ExactSubstr maintenance: drain the
    document feed micro-batch by micro-batch, emitting each batch's
    duplicated spans (vs corpus-so-far + the batch itself, via
    ``exsub_incremental``) and folding the batch's window rows into the
    persisted index — the streaming twin of the batch incremental flow,
    mirroring ``ops/incremental.py::streaming_dedup_incremental``'s
    idempotence design:

    * spans land in ``spans_dir/batch_id=N`` via per-batch OVERWRITE,
      written BEFORE the index append, so a crash between the two
      replays the batch with its windows still absent from the index
      and the recomputed spans overwrite identically;
    * a replay whose doc_ids are all already indexed is a pure no-op
      (previously-emitted spans stay, nothing re-appends).

    State lives in the INDEX (linear in corpus tokens), not the
    streaming state store — the checkpoint only tracks source progress.
    """
    from .dedup import DOC_SCHEMA

    def _fold(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        path = os.path.join(index_dir, WINDOWS_TABLE)
        if os.path.exists(path):
            seen = s.read.parquet(path).select("doc_id").distinct()
            fresh = batch.join(seen, "doc_id", "left_anti")
        else:
            materialize_exsub_index(s, batch.limit(0), index_dir,
                                    length=length)
            fresh = batch
        # consumed twice (span probe + index append) and anti-joined
        # against the table the append mutates — materialize first
        # (the compaction rule, plans/scale.py)
        fresh = fresh.localCheckpoint(eager=True)
        if not fresh.limit(1).count():
            return
        spans = exsub_incremental(s, index_dir, fresh, length=length)
        (spans.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .parquet(os.path.join(spans_dir, f"batch_id={batch_id}")))
        update_exsub_index(s, index_dir, fresh, length=length,
                           assume_new=True)

    q = (spark.readStream.schema(DOC_SCHEMA).format("parquet")
         .option("maxFilesPerTrigger", max_files_per_trigger)
         .load(docs_dir)
         .writeStream
         .foreachBatch(_fold)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def compact_exsub_index(spark: SparkSession, index_dir: str,
                        target_file_mb: int = 256,
                        min_files: int = 8) -> int:
    """Bin-pack the window-hash index's files: streaming/batch appends
    leave one small file per ingest batch, and the per-batch probe's
    index scan degrades to open-cost-dominated work — the same failure
    mode ``compact_day_partitions`` fixes for day-partitioned tables,
    for the index's flat layout. Row multiset unchanged (bit-identical
    probe results); returns the new file count, or 0 if the index was
    already compact (< ``min_files`` files — left physically untouched).

    The rewrite reads and replaces the same directory, so rows are
    MATERIALIZED first (``localCheckpoint`` — the standard decoupling,
    plans/scale.py) and the file-count target derives from on-disk
    bytes, like the day-partition compactor."""
    import math

    path = os.path.join(index_dir, WINDOWS_TABLE)
    files = [os.path.join(path, f) for f in os.listdir(path)
             if f.endswith(".parquet")]
    if len(files) < min_files:
        return 0
    total = sum(os.path.getsize(f) for f in files)
    want = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    if want >= len(files):
        return 0
    df = spark.read.parquet(path).localCheckpoint(eager=True)
    df.repartition(want).write.mode("overwrite").parquet(path)
    return want


def remove_docs_from_exsub_index(spark: SparkSession, index_dir: str,
                                 doc_ids: DataFrame) -> None:
    """Erase documents from the window-hash index (the GDPR-erasure /
    retraction leg, the flat-index twin of
    ``plans/scale.py::delete_from_day_partitions``): all window rows of
    the tombstoned ``doc_id``s are removed via a broadcast anti-join —
    the tombstone set is small by definition of an erasure batch — and
    the survivors rewrite the index in place (materialized first).

    After removal the erased documents' text no longer influences ANY
    future batch's duplicate detection; re-ingesting a removed id later
    is a legitimate fresh append (the append-contract probe will pass).
    """
    path = os.path.join(index_dir, WINDOWS_TABLE)
    survivors = (spark.read.parquet(path)
                 .join(F.broadcast(doc_ids.select("doc_id").distinct()),
                       "doc_id", "left_anti")
                 .localCheckpoint(eager=True))
    survivors.write.mode("overwrite").parquet(path)
