"""Similarity search over embedding columns (driver mandate + SURVEY.md
T5/J1/V2): brute-force exact cosine top-k baseline and an LSH-bucketed
approximate variant as the scale path.

- :func:`cosine_topk` — exact: normalize, dot via ``zip_with`` +
  ``aggregate`` (pure expressions, codegen'd), ``orderBy desc limit k``
  (TakeOrderedAndProject — no global sort materialization).
- :func:`cosine_topk_pandas` — same semantics through one vectorized
  numpy matmul pass (Arrow); faster per-row at high dims, used by bench
  to pick the physical strategy.
- :func:`lsh_bucket_topk` — random-hyperplane LSH: b sign-bits per
  vector → candidates share the query's bucket (hamming ≤ r probing),
  exact cosine re-rank inside candidates. At 10^10 rows the bucket join
  replaces the full scan; recall is tunable via (b, r).
- :func:`semantic_search` — reference semantic flow (search_service.py:
  173-208): query vec → top-k → join back to documents (J1 broadcast),
  similarity = cosine (the fixture's analog of 1 − distance).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _qnorm(qvec: list[float]) -> list[float]:
    q = np.asarray(qvec, dtype=np.float64)
    n = float(np.linalg.norm(q))
    return (q / (n or 1.0)).tolist()


def _seqdot(x: list[float]) -> float:
    """Sequential left-to-right dot(x,x) — mirrors F.aggregate fold order."""
    acc = 0.0
    for v in x:
        acc += v * v
    return acc


def cosine_topk(
    emb: DataFrame, qvec: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k, pure expressions (no Python in the scan).

    cosine = dot(e,q) / (‖e‖·‖q‖) — all double, sequential folds, so an
    ANSI-SQL list_dot_product oracle reproduces it bit-for-bit.
    """
    qd = [float(v) for v in qvec]
    qn = math.sqrt(_seqdot(qd))
    q = F.lit(qd)  # array<double> literal, constant-folded
    e = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("e"))
    dot = F.aggregate(F.zip_with("e", q, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    nrm = F.sqrt(F.aggregate("e", F.lit(0.0), lambda a, x: a + x * x))
    return (
        e.withColumn("similarity", F.round(dot / (nrm * F.lit(qn)), 6))
        .select("vid", "similarity")
        .orderBy(F.desc("similarity"), F.asc("vid"))
        .limit(k)
    )


def cosine_topk_pandas(
    emb: DataFrame, qvec: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Same result through one numpy matmul per Arrow batch."""
    q = np.asarray(_qnorm(qvec), dtype=np.float64)

    @F.pandas_udf("double")
    def _sim(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series(np.round(m @ q, 6))

    return (
        emb.select(F.col(id_col).alias("vid"), _sim(F.col(vec_col)).alias("similarity"))
        .orderBy(F.desc("similarity"), F.asc("vid"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# LSH-bucketed scale path
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_bucket_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_bits: int = 12,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: prune to buckets within hamming ≤ r of the
    query's signature, then exact cosine re-rank.

    The signature is computed in one Arrow pass; the bucket filter is a
    JVM-side ``bit_count(xor) <= r`` — at scale, signatures live as a
    persisted column and the filter prunes partitions bucketed by
    signature prefix.
    """
    q = np.asarray(_qnorm(qvec), dtype=np.float64)
    planes = _hyperplanes(dim or len(q), n_bits)
    qsig = int(((planes @ q) > 0).astype(np.uint64) @ (1 << np.arange(n_bits, dtype=np.uint64)))
    bp = planes.T.copy()

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        bits = (m @ bp) > 0
        weights = (1 << np.arange(n_bits, dtype=np.uint64))
        return pd.Series((bits.astype(np.uint64) @ weights).astype(np.int64))

    sigged = emb.withColumn("__sig", _sig(F.col(vec_col)))
    cands = sigged.filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    return cosine_topk(cands, qvec, k, id_col, vec_col)


def _train_centroids(sample: np.ndarray, n_centroids: int, seed: int = 13, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means on L2-normalized vectors (seeded
    init, fixed iteration count) — the IVF coarse quantizer. Trained on
    a bounded sample, so training cost is constant in corpus size."""
    rng = np.random.default_rng(seed)
    m = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(float(np.linalg.norm(v)), 1e-12)
    return cent


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster_id",
) -> DataFrame:
    """Attach the nearest-centroid id (one Arrow pass). At scale this
    column is PERSISTED and the table is bucketed/partitioned by it, so
    a probe scans only the probed clusters' files (partition pruning) —
    the inverted-file layout."""
    cent_t = centroids.T.copy()

    @F.pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cent_t, axis=1).astype(np.int32))

    return emb.withColumn(out_col, _assign(F.col(vec_col)))


def build_ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 13,
    train_sample: int = 4096,
) -> tuple[np.ndarray, DataFrame]:
    """IVF index-build step: train the coarse quantizer on a bounded
    seeded sample, assign every vector its cluster_id (one Arrow pass).
    Returns ``(centroids, assigned_df)``.

    This is the step that runs ONCE per corpus (like the posting-table
    build): at scale the assigned table is written ``partitionBy(
    "cluster_id")`` so a probe is a partition-pruned scan of n_probe
    directories — retraining/reassigning per query would be a full
    corpus pass per search. Training is deterministic for a fixed
    input + seed: the Bernoulli sample is a scan-side filter (no
    shuffle, no global sort) and partition-stable, and the k-means is
    seeded with a fixed iteration count — so a rebuilt quantizer
    reproduces the stored assignment exactly.
    """
    n_rows = emb.count()
    frac = min(1.0, (3.0 * train_sample) / max(n_rows, 1))
    rows = (
        emb.select(vec_col).sample(fraction=frac, seed=seed).limit(train_sample).collect()
        if frac < 1.0
        else emb.select(vec_col).limit(train_sample).collect()
    )
    sample = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    cent = _train_centroids(sample, n_centroids, seed)
    return cent, ivf_assign(emb, cent, vec_col)


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    qvec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query step over a PRE-BUILT index: rank centroids against the
    query, scan only the ``n_probe`` nearest clusters (partition-pruned
    when the assigned table is partitioned by cluster_id), exact cosine
    re-rank inside them. With ``n_probe == n_centroids`` this degrades
    to the exact scan (recall 1) — the tunable recall/cost dial."""
    q = np.asarray(_qnorm(qvec), dtype=np.float64)
    probe = np.argsort(-(centroids @ q))[:n_probe].tolist()
    cands = assigned.filter(F.col("cluster_id").isin([int(p) for p in probe]))
    return cosine_topk(cands, qvec, k, id_col, vec_col)


def ivf_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    train_sample: int = 4096,
) -> DataFrame:
    """Convenience build+search in one call (small corpora / tests);
    production splits into :func:`build_ivf_index` (once) +
    :func:`ivf_search` (per query) over a materialized assigned table."""
    cent, assigned = build_ivf_index(emb, n_centroids, vec_col, seed, train_sample)
    return ivf_search(assigned, cent, qvec, k, n_probe, id_col, vec_col)


def semantic_search(
    emb: DataFrame,
    docs: DataFrame,
    qvec: list[float],
    k: int = 10,
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """T5+J1: top-k ids → broadcast join back to document metadata,
    ANN-rank order preserved (search_service.py:182-203)."""
    topk = cosine_topk(emb, qvec, k)
    return (
        topk.join(F.broadcast(docs.withColumnRenamed(doc_id_col, "vid")), "vid")
        .orderBy(F.desc("similarity"), F.asc("vid"))
    )
