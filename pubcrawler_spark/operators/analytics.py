"""Relational analytics layer (SURVEY.md §2.2/§2.4/§2.5/§2.6/§2.7).

Spark-native rebuilds of the reference's pandas analytics:

- regex keyword filter            (run_crawler.py:92-100  → P4)
- multi-label classify + explode  (trends.py:28-47        → F5/V1/W1)
- topic aggregates + pivot + acceptance rate (trends.py:49-67 → A1-A4)
- distribution counter            (search_service.py:219  → A5)
- word frequency w/ stopwords     (analyzer.py:39-44      → A6/U4)
- top-k                           (trends.py:77,99,151    → T1/T2)

All pure-expression (whole-stage-codegen'd); the classify step is a
``rlike`` per sub-field compiled from the taxonomy — no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# Flattened from /root/reference/configs/trends.yaml (two-level taxonomy).
# Keys are sub_fields; values are the keyword lists matched with
# \b(k1|k2|...)\b case-insensitive (trends.py:37-39).
TREND_TAXONOMY: dict[str, list[str]] = {
    "LLM Alignment & RLHF/DPO": ["alignment", "rlhf", "dpo", "instruction tuning", "human feedback", "constitutional ai", "preference optimization"],
    "LLM Reasoning & Planning": ["reasoning", "chain-of-thought", "tree-of-thought", "self-consistency", "planning"],
    "Retrieval-Augmented Generation (RAG)": ["retrieval-augmented", "rag", "in-context learning", "knowledge retrieval"],
    "Mixture of Experts (MoE)": ["mixture of experts", "moe", "sparse model"],
    "State Space Models (Mamba)": ["state space model", "ssm", "mamba", "s4"],
    "Text-to-Image Generation": ["text-to-image", "dall-e", "stable diffusion", "midjourney", "image generation"],
    "Diffusion Models & Generative Theory": ["diffusion model", "denoising diffusion", "score-based", "generative model"],
    "3D Vision & Gaussian Splatting": ["3d vision", "gaussian splatting", "nerf", "neural radiance", "reconstruction", "point cloud", "view synthesis"],
    "Object Detection & Segmentation": ["object detection", "segmentation", "yolo", "mask r-cnn", "instance segmentation", "panoptic"],
    "Visual Transformers (ViT)": ["vision transformer", "vit", "visual transformer"],
    "Self-Supervised Learning (CV)": ["self-supervised", "contrastive learning", "simclr", "moco", "byol", "masked image modeling"],
    "Code Generation": ["code generation", "text-to-code", "program synthesis", "alphacode"],
    "Machine Translation": ["machine translation", "nmt", "cross-lingual"],
    "Reinforcement Learning (Algorithms)": ["actor-critic", "a2c", "a3c", "policy gradient", "sac", "ppo", "td3"],
    "Federated Learning (FL)": ["federated learning", "fl", "decentralized learning"],
    "Graph Neural Networks (GNN)": ["graph neural network", "gnn", "graph representation", "message passing"],
    "Transformers & Attention": ["transformer", "attention mechanism", "self-attention"],
    "Adversarial Robustness & Attacks": ["adversarial attack", "adversarial robustness", "defense", "adversarial example"],
    "Time Series Forecasting": ["time series", "forecasting", "temporal data", "sequential data"],
}

# NLTK-english snapshot ∪ the 40 custom academic stopwords hardcoded at
# /root/reference/src/analysis/analyzer.py:27-35 (vendored; no downloads).
NLTK_STOPWORDS = """a about above after again against all am an and any are aren't as at be
because been before being below between both but by can't cannot could couldn't did didn't
do does doesn't doing don't down during each few for from further had hadn't has hasn't have
haven't having he he'd he'll he's her here here's hers herself him himself his how how's i
i'd i'll i'm i've if in into is isn't it it's its itself let's me more most mustn't my myself
no nor not of off on once only or other ought our ours ourselves out over own same shan't she
she'd she'll she's should shouldn't so some such than that that's the their theirs them
themselves then there there's these they they'd they'll they're they've this those through to
too under until up very was wasn't we we'd we'll we're we've were weren't what what's when
when's where where's which while who who's whom why why's with won't would wouldn't you you'd
you'll you're you've your yours yourself yourselves""".split()

CUSTOM_STOPWORDS = [
    "abstract", "paper", "introduction", "method", "methods", "results", "conclusion",
    "propose", "proposed", "present", "presents", "show", "demonstrate", "model", "models",
    "state", "art", "state-of-the-art", "sota", "approach", "novel", "work", "based",
    "data", "dataset", "datasets", "training", "learning", "network", "networks",
    "performance", "task", "tasks", "key", "using", "use", "et", "al", "figure",
    "table", "analysis", "system", "systems", "research", "deep", "large",
    "also", "however", "framework", "well", "effective", "efficient",
]

ALL_STOPWORDS = sorted(set(NLTK_STOPWORDS) | set(CUSTOM_STOPWORDS))


def ensure_columns(df: DataFrame, required: list[str], fill: str = "") -> DataFrame:
    """P3 column padding (indexer.py:71-78): every column in
    ``required`` exists — missing ones are added as ``fill``, existing
    string columns are null-coalesced to ``fill`` (the reference's
    ``fillna('')``); output is ordered required-first, extras after."""
    out = df
    for c in required:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(fill))
        elif dict(out.dtypes)[c] == "string":
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(fill)))
    extras = [c for c in out.columns if c not in required]
    return out.select(*required, *extras)


def keyword_regex(keywords: list[str]) -> str:
    """trends.py:37: \\b(k1|k2|...)\\b, escaped, case-insensitive."""
    return r"(?i)\b(" + "|".join(re.escape(k) for k in keywords) + r")\b"


def keyword_filter(df: DataFrame, filters: list[str], cols=("title", "abstract")) -> DataFrame:
    """P4: keep rows where any filter matches the concatenated text
    (run_crawler.py:92-100; separator ' ' per :97)."""
    text = F.concat_ws(" ", *[F.coalesce(F.col(c), F.lit("")) for c in cols])
    return df.filter(text.rlike(keyword_regex(filters)))


def classify_subfields(
    df: DataFrame, text_cols=("title", "abstract"), taxonomy: dict[str, list[str]] | None = None
) -> DataFrame:
    """V1/F5 as pure expressions: one rlike per sub-field, collected into
    an array column ``sub_fields`` (order = taxonomy order; the
    reference returns an unordered set — consumers aggregate, so only
    membership matters)."""
    taxonomy = taxonomy or TREND_TAXONOMY
    text = F.concat_ws(" ", *[F.coalesce(F.col(c), F.lit("")) for c in text_cols])
    labels = [
        F.when(text.rlike(keyword_regex(kws)), F.lit(name))
        for name, kws in taxonomy.items()
    ]
    arr = F.array_compact(F.array(*labels))
    return df.withColumn("sub_fields", arr)


def explode_subfields(df: DataFrame) -> DataFrame:
    """W1: one row per (row, sub_field); empty arrays drop (≙ dropna)."""
    return df.withColumn("sub_field", F.explode("sub_fields"))


def topic_stats(exploded: DataFrame, decisions=("Oral", "Spotlight", "Poster", "Reject", "N/A")) -> DataFrame:
    """A1-A4 in ONE aggregation (no join chain — SURVEY.md J3 note):
    count, mean rating, decision pivot, acceptance rate.

    Tolerates corpora without review data — missing ``avg_rating`` /
    ``decision`` become nulls, like trends.py:51-57's column checks."""
    if "avg_rating" not in exploded.columns:
        exploded = exploded.withColumn("avg_rating", F.lit(None).cast("double"))
    if "decision" not in exploded.columns:
        exploded = exploded.withColumn("decision", F.lit(None).cast("string"))
    decision_counts = [
        F.sum(F.when(F.col("decision") == d, 1).otherwise(0)).alias(_dcol(d))
        for d in decisions
    ]
    agg = exploded.groupBy(F.col("sub_field").alias("topic_name")).agg(
        F.count("*").alias("paper_count"),
        F.avg("avg_rating").alias("avg_rating"),
        *decision_counts,
    )
    accepted = F.col("oral") + F.col("spotlight") + F.col("poster")
    total = accepted + F.col("reject")
    return agg.withColumn(
        "acceptance_rate",
        F.when(total == 0, F.lit(0.0)).otherwise(accepted / total),
    )


def _dcol(decision: str) -> str:
    return decision.lower().replace("/", "_")


def distribution(df: DataFrame, keys=("conference", "year")) -> DataFrame:
    """A5: Counter by keys, most-common order (ties broken by keys)."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), *keys)
    )


def word_frequency(
    df: DataFrame, text_cols=("title", "abstract"), min_len: int = 2, top_n: int | None = None
) -> DataFrame:
    """A6/U4: analyzer.py:39-44 — lower, strip punct (\\w+\\s kept),
    whitespace split, keep alpha tokens len>min_len, drop stopwords,
    count. Stopword set is anti-joined (broadcast)."""
    spark = df.sparkSession
    text = F.concat_ws(" ", *[F.coalesce(F.col(c), F.lit("")) for c in text_cols])
    # [^\p{L}\p{N}_\s] ≙ Python's unicode [^\w\s] (analyzer.py:42);
    # Java/RE2 \w is ASCII-only and would strip CJK text entirely
    tokens = (
        df.select(
            F.explode(
                F.split(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}_\s]", ""), r"\s+")
            ).alias("word")
        )
        # \p{L}+ ≙ the reference's unicode-aware str.isalpha()
        # (analyzer.py:44 keeps CJK tokens)
        .filter(F.col("word").rlike(r"^\p{L}+$") & (F.length("word") > min_len))
    )
    stop = spark.createDataFrame([(w,) for w in ALL_STOPWORDS], "word string")
    counts = (
        tokens.join(F.broadcast(stop), "word", "left_anti")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
    )
    return counts.limit(top_n) if top_n else counts


def top_n_by(df: DataFrame, metric: str, n: int, extra_order: list | None = None) -> DataFrame:
    """T1: sort_values(desc).head(n) with deterministic tie-break."""
    order = [F.desc(metric)] + (extra_order or [])
    return df.orderBy(*order).limit(n)
