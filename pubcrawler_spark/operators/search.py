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

Everything compiles to ``rlike`` with word boundaries (porter stemming
is intentionally NOT reproduced — the reference's tokenizer is an
SQLite implementation detail, not a semantic contract; exact word match
is the documented behavior we pin down and oracle-check).
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


def keyword_search(
    df: DataFrame,
    raw_query: str,
    searchable_cols: list[str],
    id_col: str,
    column_map: dict[str, str] | None = None,
) -> DataFrame:
    """Filter + rank (W2): matches ordered by score desc, id asc."""
    pred, score = compile_query(raw_query, searchable_cols, column_map)
    return (
        df.filter(pred)
        .withColumn("score", score)
        .orderBy(F.desc("score"), F.asc(id_col))
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    id_col: str,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """BM25 ranking over a tokenized posting view (the FTS5 ``ORDER BY
    rank`` analog, W2/K4 — search_service.py:158).

    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  [Robertson-Sparck Jones]
    score(d) = Σ_t idf·tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    Pure expressions end-to-end; tokenizer matches word_frequency's
    unicode class, dl = total token count. Exactly reproducible in
    ANSI SQL (oracle-checked as q31).
    """
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
