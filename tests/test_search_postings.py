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
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_posting_pruned_search_equals_full_scan(spark, corpus):
    postings = sinks.build_posting_table(corpus, "doc_id", text_cols=("text", "source"))
    for query in ["attention", "source:srcA attention", '"stream processing"',
                  "d-sm-flex", "transformer source:srcB", "nomatchterm"]:
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
