"""Text-embedding operator + incremental embed pipeline (SURVEY.md V2;
reference flow: embedder_chroma.py:56-125)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pubcrawler_spark.operators import embed


def _docs(spark, n, start=0):
    rows = [(i, f"paper about topic {i % 7} with method {i % 3} variant {i}") for i in range(start, start + n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_encoder_deterministic_and_normalized():
    texts = ["alpha beta beta gamma", "", "ALPHA beta BETA gamma", "delta"]
    a = embed.hash_encoder(texts, dim=32)
    b = embed.hash_encoder(texts, dim=32)
    assert np.array_equal(a, b)
    # case-insensitive tokenizer: rows 0 and 2 identical
    assert np.array_equal(a[0], a[2])
    # empty text → zero vector; others unit-norm
    assert np.all(a[1] == 0)
    for i in (0, 2, 3):
        assert abs(float(np.linalg.norm(a[i])) - 1.0) < 1e-5


def test_embed_text_matches_local_encoder(spark):
    df = _docs(spark, 50)
    got = {r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
           for r in embed.embed_text(df, dim=16).collect()}
    texts = [r["text"] for r in df.orderBy("doc_id").collect()]
    want = embed.hash_encoder(texts, dim=16)
    assert len(got) == 50
    for i in range(50):
        assert np.allclose(got[i], want[i], atol=1e-6), i


def test_compose_document(spark):
    df = spark.createDataFrame([("T", "A"), (None, "A2"), ("T3", None)], "title string, abstract string")
    out = [r[0] for r in df.select(embed.compose_document()).collect()]
    assert out == ["T. A", ". A2", "T3. "]


def test_incremental_embed_only_new_ids(spark):
    docs = _docs(spark, 150)
    existing = spark.createDataFrame([(i,) for i in range(100)], "vec_id long")
    new = embed.incremental_embed(docs, existing).collect()
    assert sorted(r["vec_id"] for r in new) == list(range(100, 150))


def test_run_incremental_embed_pipeline(spark, tmp_path):
    store = str(tmp_path / "vstore")
    # first run embeds everything
    assert embed.run_incremental_embed(_docs(spark, 100), store) == 100
    first = {r["vec_id"]: tuple(r["embedding"]) for r in spark.read.parquet(store).collect()}
    assert len(first) == 100
    # re-run is a no-op: nothing embedded, store byte-stable
    assert embed.run_incremental_embed(_docs(spark, 100), store) == 0
    again = {r["vec_id"]: tuple(r["embedding"]) for r in spark.read.parquet(store).collect()}
    assert again == first
    # growing the corpus embeds ONLY the delta; old vectors untouched
    assert embed.run_incremental_embed(_docs(spark, 150), store) == 50
    final = {r["vec_id"]: tuple(r["embedding"]) for r in spark.read.parquet(store).collect()}
    assert len(final) == 150
    assert all(final[i] == first[i] for i in range(100))
    # the new vectors are what embed_text computes from scratch
    scratch = {r["vec_id"]: tuple(r["embedding"])
               for r in embed.embed_text(_docs(spark, 50, start=100)).collect()}
    assert all(final[i] == scratch[i] for i in range(100, 150))
