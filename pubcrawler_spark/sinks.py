"""Sinks (SURVEY.md K1/K4/K5) — partitioned table writers.

- :func:`write_papers_csv` — the reference's CSV dataset layout
  (formatter.py:88-111): preferred column order first
  (``title,authors,abstract,pdf_url,keywords,source_url``), extras
  appended, one directory per (conference, year) via ``partitionBy``
  (the Spark-native version of the per-task output dirs).
- :func:`build_posting_table` — the FTS5 stand-in (indexer.py:27-38):
  tokenize title/authors/abstract, explode into a ``(term, doc, col)``
  posting table. Field-scoped term lookup becomes a semi-join on this
  table; the BM25-ish score in ``operators/search.py`` aggregates it.
- :func:`write_embeddings` — vector-store sink (embedder_chroma.py:
  111-125) as a plain parquet table; vec_id keyed for the ANN join-back.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PREFERRED_COLS = ["title", "authors", "abstract", "pdf_url", "keywords", "source_url"]


def write_papers_csv(df: DataFrame, path: str, partition_cols=("conference", "year")) -> None:
    """K1: column reorder (preferred first, extras after — formatter.py:
    107-109) + partitioned CSV write with header."""
    ordered = [c for c in PREFERRED_COLS if c in df.columns] + [
        c for c in df.columns if c not in PREFERRED_COLS
    ]
    (
        df.select(*ordered)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .option("header", True)
        .csv(path)
    )


def build_posting_table(
    df: DataFrame, id_col: str, text_cols=("title", "authors", "abstract"),
    stem: bool = False,
) -> DataFrame:
    """K4: (term, doc, col, tf[, term_stem]) posting rows — tokenize +
    explode. With ``stem=True`` a porter-stemmed ``term_stem`` column is
    added (the FTS5 ``tokenize='porter'`` analog, indexer.py:36), so
    "transformers" matches "transformer" via equality on the stemmed
    column; ``term`` stays exact for the oracle-checked exact-match
    surface. Stemming runs once per distinct term per Arrow batch.
    """
    parts = []
    for c in text_cols:
        toks = F.split(
            F.regexp_replace(F.lower(F.coalesce(F.col(c), F.lit(""))), r"[^\w\s]", " "), r"\s+"
        )
        parts.append(
            df.select(
                F.col(id_col).alias("doc"),
                F.lit(c).alias("col"),
                F.explode(toks).alias("term"),
            ).filter(F.length("term") > 0)
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    out = union.groupBy("term", "doc", "col").agg(F.count("*").alias("tf"))
    if stem:
        from pubcrawler_spark.functions.stem import stem_batch

        @F.pandas_udf("string")
        def _stem(terms: pd.Series) -> pd.Series:
            return stem_batch(terms)

        out = out.withColumn("term_stem", _stem(F.col("term")))
    return out


def write_index(
    df: DataFrame,
    path: str,
    sort_cols: tuple[str, ...] = ("term", "col", "doc"),
    target_file_mb: int = 128,
) -> dict:
    """Compacting index writer — the FTS5 post-bulk-load ``optimize``
    analog (/root/reference/src/search/indexer.py:99): the raw posting
    build's shuffle output is many small files in hash order; queries
    then pay per-file open cost and term-filter pushdown can't prune
    (every file spans the whole term range). This rewrites the table

    - range-partitioned on ``sort_cols[0]`` into ``ceil(bytes/target)``
      files (bounded file count at any scale), and
    - sorted by ``sort_cols`` within each file, so each file covers a
      narrow term range ⇒ parquet min/max stats prune non-matching
      files for a term-equality query, and dictionary/RLE encoding
      compresses the sorted runs.

    Two phases (measure, then rewrite) because the compacted file count
    needs the ACTUAL on-disk size: write raw to scratch, stat it,
    rewrite compacted, atomically swap into ``path``. Returns
    ``{"files": n, "bytes": total}``.
    """
    import math
    import os
    import shutil
    import uuid

    spark = df.sparkSession
    tag = uuid.uuid4().hex[:8]
    raw, compacted = f"{path}__raw_{tag}", f"{path}__compact_{tag}"
    try:
        df.write.mode("overwrite").parquet(raw)
        total = sum(
            os.path.getsize(os.path.join(raw, f))
            for f in os.listdir(raw)
            if f.endswith(".parquet")
        )
        n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
        (
            spark.read.parquet(raw)
            .repartitionByRange(n_files, *sort_cols[:1])
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .parquet(compacted)
        )
        # swap without a visibility gap: rename the old index ASIDE
        # (readers holding the old path keep their open files), rename
        # the compacted build into place, then delete the old dir. If
        # the second rename fails, the except guard restores the old
        # index at `path` before re-raising, so readers of `path` never
        # see it missing (a hard crash between the two renames still
        # leaves the old data recoverable at the __old tag).
        old = f"{path}__old_{tag}"
        had_old = os.path.isdir(path)
        if had_old:
            os.rename(path, old)
        try:
            os.rename(compacted, path)
        except BaseException:
            if had_old and not os.path.exists(path):
                try:
                    os.rename(old, path)
                except OSError:
                    # restore failed too: the previous index is intact
                    # but stranded at the __old tag — name it loudly so
                    # an operator can recover it by hand
                    import logging

                    logging.getLogger(__name__).error(
                        "compact_index: restore rename failed; previous "
                        "index stranded at %s", old,
                    )
                    raise
            raise
        shutil.rmtree(old, ignore_errors=True)
        n_out = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        out_bytes = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        return {"files": n_out, "bytes": out_bytes}
    finally:
        shutil.rmtree(raw, ignore_errors=True)
        shutil.rmtree(compacted, ignore_errors=True)


def term_lookup(postings: DataFrame, term: str, col: str | None = None) -> DataFrame:
    """Field-scoped posting lookup (FTS MATCH stand-in)."""
    out = postings.filter(F.col("term") == term.lower())
    if col is not None:
        out = out.filter(F.col("col") == col)
    return out.select("doc").distinct()


def sanitize_filename(col, suffix: str = ".pdf", max_len: int = 100):
    """P10: safe filename from a title (processor.py:30-35) — strip the
    reference's invalid-character class, truncate to ``max_len``, append
    the suffix. Pure expression (substring is codepoint-based, matching
    the reference's Python slice)."""
    cleaned = F.regexp_replace(col, r'[\\/*?:"<>|]', "")
    return F.concat(F.substring(cleaned, 1, max_len), F.lit(suffix))


def write_embeddings(df: DataFrame, path: str, n_buckets: int = 64) -> None:
    """K5: embeddings table, repartitioned by id hash so the ANN
    join-back and shard-local scans are balanced."""
    df.repartition(n_buckets, F.col(df.columns[0])).write.mode("overwrite").parquet(path)
