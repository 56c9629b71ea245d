"""Posting-table search paths: porter stemmer, posting-pruned keyword
search (lossless vs full scan), index-backed BM25, stemmed FTS recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pubcrawler_spark import sinks
from pubcrawler_spark.functions.stem import porter_stem
from pubcrawler_spark.operators import search


def test_porter_known_vectors():
    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "hopping": "hop", "falling": "fall",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "electrical": "electr", "hopefulness": "hope", "goodness": "good",
        "allowance": "allow", "inference": "infer", "adjustable": "adjust",
        "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
        "effective": "effect", "rate": "rate", "roll": "roll",
        "controlling": "control", "transformers": "transform",
        "transformer": "transform", "transformations": "transform",
        "queries": "queri", "query": "queri", "stemming": "stem",
        "embeddings": "embed", "arguments": "argument",
    }
    got = {w: porter_stem(w) for w in vectors}
    assert got == vectors


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "vision transformers beat convolutions", "srcA"),
        (1, "one transformer layer suffices", "srcB"),
        (2, "streaming joins with watermarks", "srcA"),
        (3, "stream processing at scale", "srcB"),
        (4, "graph networks and attention", "srcA"),
        (5, "the d-sm-flex layout strikes again", "srcB"),
        (6, "attention is not all you need", "srcA"),
        (7, "the cafés naïve review corpus", "srcB"),
        (8, "東京 corpus notes", "srcA"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_posting_pruned_search_equals_full_scan(spark, corpus):
    postings = sinks.build_posting_table(corpus, "doc_id", text_cols=("text", "source"))
    # café/naïve: prune tokens must come from the JVM-ASCII alphabet the
    # posting tokenizer uses, else the semi-join drops every candidate;
    # 東京 has no ASCII run at all, so pruning must be skipped entirely
    for query in ["attention", "source:srcA attention", '"stream processing"',
                  "d-sm-flex", "transformer source:srcB", "nomatchterm",
                  "cafés", "naïve review", "東京", "東京 corpus"]:
        full = [(r["doc_id"], r["score"]) for r in
                search.keyword_search(corpus, query, ["text", "source"], "doc_id").collect()]
        pruned = [(r["doc_id"], r["score"]) for r in
                  search.keyword_search(corpus, query, ["text", "source"], "doc_id",
                                        postings=postings).collect()]
        assert pruned == full, query


def test_bm25_index_path_equals_corpus_path(spark, corpus):
    index = search.build_bm25_index(corpus, "doc_id", "text")
    via_df = [(r["doc"], r["bm25"]) for r in
              search.bm25_search(corpus, ["attention", "stream"], "doc_id", "text").collect()]
    via_index = [(r["doc"], r["bm25"]) for r in
                 search.bm25_search(None, ["attention", "stream"], index=index).collect()]
    assert via_index == via_df
    assert via_df, "query should hit"


def test_stemmed_search_fts_recall(spark, corpus):
    postings = sinks.build_posting_table(corpus, "doc_id", text_cols=("text",), stem=True)
    # FTS5-porter recall: "transformers" matches docs with "transformer"
    got = {r["doc_id"] for r in
           search.stemmed_search(postings, "transformers", id_col_out="doc_id").collect()}
    assert got == {0, 1}
    # "streaming" matches "stream" and vice versa
    got = {r["doc_id"] for r in
           search.stemmed_search(postings, "streams", id_col_out="doc_id").collect()}
    assert got == {2, 3}
    # AND semantics across parts
    got = {r["doc_id"] for r in
           search.stemmed_search(postings, "streaming joined", id_col_out="doc_id").collect()}
    assert got == {2}
    # exact-match surface would NOT find these (the documented gap)
    exact = search.keyword_search(corpus, "transformers", ["text"], "doc_id").count()
    assert exact == 1  # only doc 0 has the literal plural


def test_index_cache_key_invalidation(tmp_path):
    """The materialized-index cache key must change when (a) the source
    parquet is regenerated at the same path and (b) the builder modules'
    source changes — so stale indexes can never be served (VERDICT r2 /
    ADVICE r2: /tmp cache keyed only by a manual version token)."""
    import os
    import shutil
    import time

    from pubcrawler_spark.queries import _index_cache_key

    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/documents.parquet", sf / "documents.parquet")
    k1 = _index_cache_key(str(sf), "postings_docs")
    assert k1 == _index_cache_key(str(sf), "postings_docs")  # stable
    assert k1 != _index_cache_key(str(sf), "postings_stem")  # per-name
    # regenerating the fixture (same path, new mtime) invalidates
    t = time.time() + 5
    os.utime(sf / "documents.parquet", (t, t))
    k2 = _index_cache_key(str(sf), "postings_docs")
    assert k2 != k1
    # the key covers the builder modules' source text: recompute with
    # the same inputs but one builder module's source perturbed
    import inspect
    import unittest.mock as mock

    real = inspect.getsource
    from pubcrawler_spark import sinks

    def fake(obj):
        src = real(obj)
        return src + "\n# tokenizer edited" if obj is sinks else src

    with mock.patch("inspect.getsource", side_effect=fake):
        k3 = _index_cache_key(str(sf), "postings_docs")
    assert k3 != k2


def test_q34_stemmed_search_golden_sf001(spark):
    """Value-level anchor for the rows-only q34 driver entry: DuckDB's
    fts/stem() extension cannot install offline, so pin the exact
    (doc_id, score) rowset on the sf0.01 fixture instead. Any tokenizer/
    stemmer/AND-semantics drift changes the digest."""
    import hashlib

    from pubcrawler_spark.queries import QUERIES

    rows = QUERIES["q34_stemmed_search"](spark, "/root/testdata/sf0.01").collect()
    tup = [(r["doc_id"], r["score"]) for r in rows]
    assert len(tup) == 326
    assert tup[:10] == [(1, 2), (3, 2), (4, 2), (5, 2), (7, 2),
                        (8, 2), (9, 2), (10, 2), (11, 2), (12, 2)]
    digest = hashlib.sha256(str(sorted(tup)).encode()).hexdigest()
    assert digest == "18cf0ba07e66c13efe97a0d5c35b3f0bb6f0423212aeb79253c91a563fe4bc50"


def test_write_index_compaction_parity(spark, corpus, tmp_path):
    """The compacted (term-sorted, size-targeted) index answers the same
    queries as the in-memory posting table: bounded file count, and
    keyword_search over the compacted postings == full scan."""
    postings = sinks.build_posting_table(corpus, "doc_id", text_cols=("text", "source"))
    out = str(tmp_path / "idx")
    stats = sinks.write_index(postings, out, target_file_mb=128)
    assert stats["files"] == 1  # tiny corpus fits one target-size file
    import os
    assert sum(1 for f in os.listdir(out) if f.endswith(".parquet")) == stats["files"]
    compacted = spark.read.parquet(out)
    assert compacted.count() == postings.count()
    for query in ["attention", "source:srcA attention", "transformer source:srcB"]:
        full = [(r["doc_id"], r["score"]) for r in
                search.keyword_search(corpus, query, ["text", "source"], "doc_id").collect()]
        via_idx = [(r["doc_id"], r["score"]) for r in
                   search.keyword_search(corpus, query, ["text", "source"], "doc_id",
                                         postings=compacted).collect()]
        assert via_idx == full, query
