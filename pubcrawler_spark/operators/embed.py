"""Batch text embedding + incremental embed pipeline (SURVEY.md V2).

The reference's semantic-index flow (/root/reference/src/search/
embedder_chroma.py:56-125) is: collect already-embedded ids from the
vector store, diff against all document ids, batch-encode ONLY the new
documents as ``f"{title}. {abstract}"``, and upsert (id, vector,
metadata) into the store. Here the same flow is Spark-native:

- :func:`embed_text` — mapInPandas batch encoder. The default encoder
  is a deterministic feature-hashing projection (murmur3 token hash →
  signed bucket, L2-normalized — the standard hashing-trick embedding);
  a real sentence-transformer drops in as ``encoder=`` with the same
  ``list[str] -> np.ndarray`` contract (model loaded once per worker,
  Arrow batches ≙ the reference's ``batch_size=64`` encode batches).
- :func:`compose_document` — the reference's ``f"{title}. {abstract}"``
  document text (embedder_chroma.py:104).
- :func:`incremental_embed` — anti-join new ids (J2) → encode.
- :func:`run_incremental_embed` — the composed job against a parquet
  vector store: read store ids, embed only missing docs, append. Ids
  are new by construction so parquet append ≙ Chroma upsert
  (embedder_chroma.py:117-125); re-runs are no-ops.

100 TB notes: the anti-join shuffles only (id) pairs; encoding cost is
proportional to NEW docs only; the store append never rewrites existing
vectors. Encoder work is the hot path — batches stay Arrow-sized and
the UDF is stateless so Spark can retry tasks safely.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from pubcrawler_spark.functions.hashing import murmur3_64_batch

EMBED_DDL = "vec_id long, embedding array<float>"

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def hash_encoder(texts: list[str], dim: int = 64) -> np.ndarray:
    """Deterministic feature-hashing encoder (the hashing trick):
    token → murmur3_64 → bucket ``h mod dim`` with sign ``±1`` from the
    next hash bit, weighted by term frequency, L2-normalized. Stable
    across runs/partitions/Python versions (no PYTHONHASHSEED)."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall((t or "").lower())
        if not toks:
            continue
        uniq, counts = np.unique(toks, return_counts=True)
        h = murmur3_64_batch(list(uniq)).astype(np.uint64)
        idx = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
        np.add.at(out[i], idx, sign * counts)
        nrm = float(np.linalg.norm(out[i]))
        if nrm > 0:
            out[i] /= nrm
    return out


def compose_document(title_col: str = "title", abstract_col: str = "abstract"):
    """The reference's embed text: ``f"{title}. {abstract}"``
    (embedder_chroma.py:104)."""
    return F.concat_ws(
        ". ",
        F.coalesce(F.col(title_col), F.lit("")),
        F.coalesce(F.col(abstract_col), F.lit("")),
    )


def embed_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    encoder: Callable[[list[str]], np.ndarray] | None = None,
    dim: int = 64,
) -> DataFrame:
    """(id, text) → (vec_id, embedding array<float>) via one Arrow pass
    per batch. Column pruning keeps everything but (id, text) out of the
    scan; the UDF is stateless and deterministic for a deterministic
    encoder."""
    enc = encoder or (lambda ts: hash_encoder(ts, dim))

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            vecs = enc(pdf[text_col].fillna("").tolist())
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "embedding": [v.astype(np.float32).tolist() for v in vecs],
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(_run, schema=EMBED_DDL)


def incremental_embed(
    docs: DataFrame,
    existing_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    encoder: Callable[[list[str]], np.ndarray] | None = None,
    dim: int = 64,
) -> DataFrame:
    """Embed only the docs whose id is NOT in ``existing_ids`` (first
    column used): the reference's set-difference step
    (embedder_chroma.py:66-70) as a left_anti join — shuffles only ids,
    encodes only the new rows."""
    ex = existing_ids.select(F.col(existing_ids.columns[0]).alias(id_col)).distinct()
    new = docs.join(ex, id_col, "left_anti")
    return embed_text(new, id_col, text_col, encoder, dim)


def run_incremental_embed(
    docs: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    encoder: Callable[[list[str]], np.ndarray] | None = None,
    dim: int = 64,
) -> int:
    """The composed incremental job: read store ids → anti-join → encode
    → append. Returns the number of newly embedded docs (0 ⇒ no-op —
    nothing is written, matching embedder_chroma.py:72-75)."""
    spark = docs.sparkSession
    if os.path.isdir(store_path) and any(
        f.endswith(".parquet") for f in os.listdir(store_path)
    ):
        existing = spark.read.parquet(store_path).select("vec_id")
    else:
        existing = spark.createDataFrame([], "vec_id long")
    new_emb = incremental_embed(docs, existing, id_col, text_col, encoder, dim)
    # Materialize the delta to a scratch dir BEFORE appending: the
    # anti-join plan reads store_path, so appending from the live plan
    # risks a cache-evicted partition recomputing against the store's
    # new file listing (duplicating vectors). A written copy has no
    # lineage back to the store. Append only if non-empty (ids are new
    # by construction, so append ≙ upsert; 0 new ⇒ store untouched,
    # matching embedder_chroma.py:72-75).
    import shutil
    import uuid

    scratch = f"{store_path.rstrip('/')}__delta_{uuid.uuid4().hex[:12]}"
    try:
        new_emb.write.mode("overwrite").parquet(scratch)
        # delta size from the parquet footers just written — no Spark
        # job between the delta write and the append (the crawl loop's
        # zero-action counter discipline)
        import pyarrow.parquet as pq

        data_files = [
            f for f in os.listdir(scratch)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        # pq.read_metadata opens/closes per call (no leaked handles);
        # the name filter above keys on the .parquet suffix rather than
        # the local committer's part-* prefix so a committer/codec
        # change cannot silently under-count the delta (n==0 skips the
        # append). Guard anyway: data present but nothing matched ⇒
        # layout assumption broke — fail loudly instead of dropping it.
        n = sum(
            pq.read_metadata(os.path.join(scratch, f)).num_rows for f in data_files
        )
        if not data_files and any(
            not f.startswith(("_", ".")) for f in os.listdir(scratch)
        ):
            raise RuntimeError(
                f"incremental-embed delta dir {scratch} contains data files "
                "with an unrecognized layout; refusing to silently skip append"
            )
        if n:
            spark.read.parquet(scratch).write.mode("append").parquet(store_path)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return n
