"""Keyword search: field-scoped query compiler + match scoring
(SURVEY.md V4/W2/A5; reference search_service.py:118-170).

The reference compiles ``author:vaswani title:"vision transformer" term``
into an SQLite FTS5 MATCH string (search_service.py:125-151). Here the
same surface compiles into a Catalyst filter tree plus a rank score:

- field-scoped terms/phrases restrict to that column,
- bare terms/phrases match any searchable column,
- all parts AND-combined (FTS5 ``' AND '.join`` semantics),
- score = number of distinct matched (part, column) hits — a cheap
  BM25 stand-in ordered like FTS5 ``ORDER BY rank`` (W2); ties broken
  by id for determinism.

Match semantics compile to ``rlike`` with word boundaries — exact word
match is the oracle-checked contract. Two scale/recall extensions sit
on the materialized posting table (K4, ``sinks.build_posting_table``):

- **posting-pruned search** — pass ``postings=`` to
  :func:`keyword_search`: candidates are pruned by semi-joins on the
  posting table (each query part contributes its longest ``\\w+``
  subtoken; any doc the rlike predicate matches necessarily contains
  every such subtoken as a posting term, so pruning is lossless), then
  the identical predicate/score verifies — same rows as the full scan,
  but the scan is over the posting table + survivors, not the corpus.
- **stemmed match** — :func:`stemmed_search` matches porter-stemmed
  query tokens against the ``term_stem`` posting column: the FTS5
  ``tokenize='porter'`` recall semantics ("transformers" matches
  "transformer"), deliberately a separate surface from the exact-match
  contract above.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

COLUMN_MAP = {"author": "authors", "title": "title", "abstract": "abstract", "text": "text", "source": "source", "lang": "lang"}

_FIELD_RE = re.compile(r"(\b\w+):(?:\"([^\"]*)\"|(\S+))")


def parse_query(raw: str, column_map: dict[str, str] | None = None):
    """-> (field_parts: list[(column, value)], general_parts: list[str])."""
    column_map = column_map or COLUMN_MAP
    field_parts: list[tuple[str, str]] = []
    remaining = raw
    for m in list(_FIELD_RE.finditer(raw)):
        alias = m.group(1).lower()
        value = m.group(2) if m.group(2) is not None else m.group(3)
        if alias in column_map:
            field_parts.append((column_map[alias], value))
            remaining = re.sub(re.escape(m.group(0)), "", remaining, count=1)
    general = [t.strip('"') for t in re.findall(r'"[^"]*"|\S+', remaining.strip())]
    return field_parts, [g for g in general if g]


def _word_match(col: Column, phrase: str) -> Column:
    return col.rlike(r"(?i)\b" + re.escape(phrase) + r"\b")


def compile_query(
    raw: str, searchable_cols: list[str], column_map: dict[str, str] | None = None
) -> tuple[Column, Column]:
    """-> (predicate, score). AND of all parts; score counts matches."""
    field_parts, general = parse_query(raw, column_map)
    predicates: list[Column] = []
    score: Column = F.lit(0)
    for col_name, value in field_parts:
        hit = _word_match(F.col(col_name), value)
        predicates.append(hit)
        score = score + hit.cast("int")
    for term in general:
        hits = [_word_match(F.col(c), term) for c in searchable_cols]
        any_hit = hits[0]
        for h in hits[1:]:
            any_hit = any_hit | h
        predicates.append(any_hit)
        for h in hits:
            score = score + h.cast("int")
    if not predicates:
        return F.lit(False), F.lit(0)
    pred = predicates[0]
    for p in predicates[1:]:
        pred = pred & p
    return pred, score


def _prune_token(value: str) -> str | None:
    """Longest ASCII-word run of a query term/phrase — the posting term
    every rlike word-boundary match is guaranteed to contain.

    Must mirror the posting tokenizer's alphabet EXACTLY: the index is
    built with JVM ``[^\\w\\s]`` (Java ``\\w`` = ASCII ``[A-Za-z0-9_]``),
    so a Unicode-``\\w`` prune token like ``café`` can never exist as a
    posting term — the semi-join would drop every doc and "lossless"
    pruning would silently return zero rows. Instead: take maximal
    ``[A-Za-z0-9_]+`` runs of the RAW value (non-ASCII word chars act as
    separators, exactly as the JVM tokenizer treats them), ASCII-lower
    the longest. Soundness: an rlike match contains the literal value,
    whose ASCII runs are delimited by non-word chars in both the pattern
    and the tokenizer, so each run surfaces as a complete posting term.
    A value with no ASCII run (e.g. a CJK term) returns None — the
    caller skips pruning and verifies by rlike alone."""
    toks = re.findall(r"[A-Za-z0-9_]+", value)
    return max(toks, key=len).lower() if toks else None


def keyword_search(
    df: DataFrame,
    raw_query: str,
    searchable_cols: list[str],
    id_col: str,
    column_map: dict[str, str] | None = None,
    postings: DataFrame | None = None,
    posting_cols: list[str] | None = None,
) -> DataFrame:
    """Filter + rank (W2): matches ordered by score desc, id asc.

    With ``postings`` (built over ``posting_cols``, default
    ``searchable_cols``): per-query work is semi-joins on the posting
    table plus predicate verification on the surviving docs — the
    100 TB path, identical results to the full scan (pruning is
    lossless, see module docstring).
    """
    pred, score = compile_query(raw_query, searchable_cols, column_map)
    if postings is not None:
        posting_cols = list(posting_cols or searchable_cols)
        field_parts, general = parse_query(raw_query, column_map)
        cand: DataFrame | None = None

        def _and(cur, docs):
            return docs if cur is None else cur.join(docs, "doc", "left_semi")

        for col_name, value in field_parts:
            tok = _prune_token(value)
            if tok is None or col_name not in posting_cols:
                continue  # no sound prune for this part — verify-only
            docs = (
                postings.filter((F.col("term") == tok) & (F.col("col") == col_name))
                .select("doc").distinct()
            )
            cand = _and(cand, docs)
        scannable = [c for c in searchable_cols if c in posting_cols]
        for term in general:
            tok = _prune_token(term)
            # a general part may match ANY searchable column; pruning is
            # only sound if the posting table covers all of them
            if tok is None or len(scannable) != len(searchable_cols):
                continue
            docs = (
                postings.filter((F.col("term") == tok) & F.col("col").isin(scannable))
                .select("doc").distinct()
            )
            cand = _and(cand, docs)
        if cand is not None:
            df = df.join(
                cand.withColumnRenamed("doc", id_col), id_col, "left_semi"
            )
    return (
        df.filter(pred)
        .withColumn("score", score)
        .orderBy(F.desc("score"), F.asc(id_col))
    )


def stemmed_search(
    postings: DataFrame,
    raw_query: str,
    id_col_out: str = "doc",
    column_map: dict[str, str] | None = None,
) -> DataFrame:
    """FTS5-porter-parity match over a stemmed posting table
    (``build_posting_table(..., stem=True)``): every query token is
    porter-stemmed and matched by equality on ``term_stem``; parts are
    AND-combined, score = number of distinct (part, col) hits — so
    "transformers" matches docs containing "transformer"
    (indexer.py:36 recall semantics).
    """
    from pubcrawler_spark.functions.stem import porter_stem

    field_parts, general = parse_query(raw_query, column_map)
    parts: list[DataFrame] = []
    for col_name, value in field_parts:
        for tok in re.findall(r"\w+", value.lower()):
            parts.append(
                postings.filter(
                    (F.col("term_stem") == porter_stem(tok)) & (F.col("col") == col_name)
                ).select("doc", "col")
            )
    for term in general:
        for tok in re.findall(r"\w+", term.lower()):
            parts.append(
                postings.filter(F.col("term_stem") == porter_stem(tok)).select("doc", "col")
            )
    if not parts:
        return postings.sparkSession.createDataFrame([], f"{id_col_out} long, score long")
    hits = None
    for i, p in enumerate(parts):
        h = p.withColumn("part", F.lit(i))
        hits = h if hits is None else hits.unionByName(h)
    per_doc = hits.dropDuplicates(["doc", "col", "part"]).groupBy("doc").agg(
        F.count("*").alias("score"),
        F.countDistinct("part").alias("__nparts"),
    )
    return (
        per_doc.filter(F.col("__nparts") == len(parts))  # AND semantics
        .select(F.col("doc").alias(id_col_out), "score")
        .orderBy(F.desc("score"), F.asc(id_col_out))
    )


def build_bm25_index(df: DataFrame, id_col: str, text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """(tf, dl) posting/doclen tables for :func:`bm25_search` — the K4
    index-build step, run ONCE and materialized (parquet/Iceberg); every
    query is then joins against these tables, never a corpus scan.
    Tokenizer matches word_frequency's unicode class."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[^\p{L}\p{N}_\s]", ""),
                r"\s+",
            )
        ).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    return tf, dl


def bm25_corpus_stats(dl: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) corpus-stats table — computed at INDEX
    BUILD time and stored beside (tf, dl), so :func:`bm25_search` reads
    two scalars from a materialized 1-row table instead of running an
    aggregation job per query."""
    return dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )


def bm25_search(
    df: DataFrame | None,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    index: tuple[DataFrame, DataFrame] | None = None,
    stats: tuple[float, float] | None = None,
) -> DataFrame:
    """BM25 ranking over the (tf, dl) posting index (the FTS5 ``ORDER BY
    rank`` analog, W2/K4 — search_service.py:158).

    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  [Robertson-Sparck Jones]
    score(d) = Σ_t idf·tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    Pass ``index=`` (a materialized :func:`build_bm25_index` output) so
    the query plan scans the posting table — the per-query corpus
    re-tokenization only happens in the convenience ``df`` form. Pass
    ``stats=(n_docs, avgdl)`` — read from the 1-row
    :func:`bm25_corpus_stats` table stored beside the index — so the
    per-query plan is join-only; without it the two scalars are
    aggregated from ``dl`` once per query (convenience/test path).
    Exactly reproducible in ANSI SQL (oracle-checked as q31).
    """
    if index is None:
        if df is None:
            raise ValueError("need either df or index")
        index = build_bm25_index(df, id_col, text_col)
    tf, dl = index
    if stats is not None:
        n_docs, avgdl = stats
    else:
        n_docs, avgdl = dl.agg(F.count("*"), F.avg("dl")).collect()[0]

    qt = tf.filter(F.col("term").isin(query_terms)).join(dl, "doc")
    df_t = qt.groupBy("term").agg(F.countDistinct("doc").alias("df"))
    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    scored = (
        qt.join(F.broadcast(df_t), "term")
        .withColumn(
            "part",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
        .groupBy("doc")
        .agg(F.round(F.sum("part"), 6).alias("bm25"), F.count("*").alias("n_terms_hit"))
        .orderBy(F.desc("bm25"), F.asc("doc"))
        .limit(top_n)
    )
    return scored


def search_stats(results: DataFrame, keys=("conference", "year")) -> DataFrame:
    """A5: distribution of results by keys, most-common first."""
    return (
        results.groupBy(*keys)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), *keys)
    )
