"""Deduplication operators for web-scale training data (driver mandate).

Five families, each scale-conscious:

- **exact**        — md5-of-normalized-text groupBy (shuffle on 16-byte
  key only; at 100 TB use two-level: partial agg + repartition by hash).
- **ngram-jaccard**— exact character-shingle Jaccard over candidate
  pairs via shingle-explode + self-join on shingle (the join prunes the
  O(n²) pair space to pairs sharing ≥1 shingle; at scale apply DF
  frequency cut to drop stop-shingles).
- **minhash-LSH**  — shingles → k minhash lanes (numpy, one Arrow pass)
  → band buckets → join on (band, bucket-hash): only same-bucket pairs
  meet, the standard 10^10-doc near-dup plan (cf. GPT-3/Gopher dedup).
- **simhash**      — 64-bit weighted-token hash; near-dups = pairs with
  hamming distance ≤ t, bucketed by 4 16-bit chunks (Charikar).
- **embedding**    — cosine ≥ τ pairs over normalized vectors
  (see ann.py for the top-k variant).

MinHash/SimHash signatures are computed in a single vectorized pandas
UDF per doc (Arrow-batched); all pair-finding is pure DataFrame joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pubcrawler_spark.functions.hashing import murmur3_64_batch

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) docs: fp, dup count, min id."""
    norm = F.lower(F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")))
    return (
        df.withColumn("fp", F.md5(norm))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
        .orderBy("fp")
    )


# ---------------------------------------------------------------------------
# shingles + exact n-gram jaccard
# ---------------------------------------------------------------------------


def _norm_text(col):
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def char_shingles(df: DataFrame, id_col: str, text_col: str = "text", k: int = 5) -> DataFrame:
    """(doc, shingle) distinct rows — character k-grams of normalized
    text. Pure expressions: sequence → transform(substr) →
    array_distinct → explode (whole-stage codegen'd, no UDF)."""
    norm = _norm_text(F.coalesce(F.col(text_col), F.lit("")))
    df2 = df.select(F.col(id_col).alias("doc"), norm.alias("__t")).withColumn(
        "__n", F.length("__t") - F.lit(k - 1)
    )
    return df2.filter(F.col("__n") > 0).select(
        "doc",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.col("__n")),
                    lambda i: F.col("__t").substr(i, F.lit(k)),
                )
            )
        ).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5, threshold: float = 0.6
) -> DataFrame:
    """Exact Jaccard over char k-shingle sets for pairs sharing ≥1 shingle.

    shuffle plan: explode → groupBy(shingle) self-join → count
    intersections → join per-doc sizes → |A∩B| / (|A|+|B|-|A∩B|).
    """
    sh = char_shingles(df, id_col, text_col, k).cache()
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.withColumnRenamed("doc", "doc_a")
    b = sh.withColumnRenamed("doc", "doc_b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
    return out


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_matrix(shingle_hashes: list[np.ndarray], n_perm: int, seed: int = 7) -> np.ndarray:
    """Per-doc minhash signatures via universal hashing a*x+b mod p."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    out = np.empty((len(shingle_hashes), n_perm), dtype=np.uint64)
    for i, h in enumerate(shingle_hashes):
        if len(h) == 0:
            out[i] = np.uint64(_MERSENNE)
            continue
        x = h.astype(np.uint64)[None, :]
        vals = (a[:, None] * x + b[:, None]) % np.uint64(_MERSENNE)
        out[i] = vals.min(axis=1)
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5, n_perm: int = 64
) -> DataFrame:
    """(doc, sig array<long>) — one vectorized Arrow pass."""

    @F.pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        norm = texts.fillna("").str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
        hashes = []
        for t in norm:
            grams = list({t[i : i + k] for i in range(max(0, len(t) - k + 1))})
            hashes.append(murmur3_64_batch(grams) if grams else np.empty(0, np.int64))
        mat = _minhash_matrix(hashes, n_perm).astype(np.int64)
        return pd.Series(list(mat))

    return df.select(F.col(id_col).alias("doc"), _sig(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    n_perm: int = 64,
    bands: int = 16,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """Candidate pairs sharing ≥1 LSH band bucket, with estimated
    similarity = fraction of matching minhash lanes; optionally verified
    by the signature-level estimate ≥ threshold.

    Scale plan: explode to (band, bucket_hash) rows — the shuffle key is
    the bucket hash, so only true candidates ever meet in a reducer.
    """
    rows_per_band = n_perm // bands
    sig = minhash_signatures(df, id_col, text_col, k, n_perm).cache()
    banded = sig.select(
        "doc",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band).cast("string")
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"), "band", "bucket")
    b = banded.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = cand.withColumn(
        "est_jaccard",
        F.round(
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    lambda v: v == 1,
                )
            )
            / F.lit(n_perm),
            6,
        ),
    ).select("doc_a", "doc_b", "est_jaccard")
    if verify_threshold is not None:
        est = est.filter(F.col("est_jaccard") >= verify_threshold)
    return est.orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word tokens (Charikar): sign-sum of token
    hashes weighted by term frequency; one vectorized Arrow pass."""

    @F.pandas_udf("long")
    def _sim(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        norm = texts.fillna("").str.lower().str.replace(r"[^\w\s]", "", regex=True)
        for i, t in enumerate(norm):
            toks = t.split()
            if not toks:
                continue
            uniq, counts = np.unique(toks, return_counts=True)
            h = murmur3_64_batch(list(uniq)).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            sig = np.uint64(0)
            for j in np.nonzero(v > 0)[0]:
                sig |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col).alias("doc"), _sim(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ t, found by bucketing on
    each of 4 16-bit chunks (pigeonhole: ≤3 differing bits leave ≥1
    chunk identical) then verifying with bit_count(xor)."""
    sig = simhash_signatures(df, id_col, text_col).cache()
    chunked = sig.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunked.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("h_a"), "chunk_idx", "chunk")
    b = chunked.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("h_b"), "chunk_idx", "chunk")
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.95
) -> DataFrame:
    """Pairs with cosine similarity ≥ τ. Exact (all-pairs) baseline —
    at scale swap the cross join for the LSH-bucketed candidates of
    ann.lsh_bucket_topk (same verify expression).

    cosine = dot(a,b) / (‖a‖·‖b‖), computed in double with sequential
    folds so the DuckDB list_dot_product oracle matches bit-for-bit.
    """
    def _dot(x, y):
        return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)

    # hoist per-row norms: higher-order-function lambdas evaluate
    # interpreted, and recomputing dot(v,v) per PAIR tripled the O(n²)
    # work (observed 127 s → ~40 s at 5k vectors)
    n = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", F.sqrt(_dot("v", "v")))
    a = n.select(F.col("vid").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a"))
    b = n.select(F.col("vid").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
    cos = _dot("v_a", "v_b") / (F.col("n_a") * F.col("n_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )
