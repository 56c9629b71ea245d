"""Text-analysis operators for a training-data pipeline (driver mandate):
language-ID, quality scoring, token counting, document fingerprinting.

All pure-expression (JVM-side, whole-stage codegen — no UDFs), designed
so each has an exact ANSI-SQL oracle for the DuckDB correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Marker words per language for the n-gram/stopword-count heuristic.
# Chosen to be SQL-expressible (regexp_count in both Spark and DuckDB).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with", "for"],
    "de": ["der", "die", "und", "das", "nicht", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "pour", "dans"],
    "es": ["el", "los", "las", "es", "para", "una", "con"],
}


def _marker_count(col, words: list[str]):
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-word counts,
    'und' (undetermined) when all are zero. Deterministic tie-break by
    language order en > de > fr > es (strictly-greater comparison)."""
    col = F.col(text_col)
    scores = {lang: _marker_count(col, ws) for lang, ws in LANG_MARKERS.items()}
    df = df.withColumns({f"score_{lang}": s for lang, s in scores.items()})
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = F.col(f"score_{lang}")
        better = s > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, s).otherwise(best_score)
    return df.withColumn("lang_pred", best)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio,
    mean word length, and a composite [0,1] score (webtext-style
    filtering signals, cf. C4/Gopher rules)."""
    col = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(col)
    n_words = F.size(F.split(F.trim(col), r"\s+"))
    n_punct = F.regexp_count(col, F.lit(r"[^\w\s]"))
    n_stop = _marker_count(col, LANG_MARKERS["en"])
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(0.0)
    mean_word_len = F.when(n_words > 0, (n_chars - n_words + 1) / n_words).otherwise(0.0)
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), 0.4).otherwise(0.0)
        + F.when((punct_ratio > 0.0) & (punct_ratio < 0.2), 0.3).otherwise(0.0)
        + F.when(stop_ratio > 0.05, 0.3).otherwise(0.0)
    )
    return (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("mean_word_len", F.round(mean_word_len, 6))
        .withColumn("quality", F.round(score, 2))
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (words / numbers / single non-space symbols), the standard
    pre-tokenizer shape."""
    col = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.when(F.length(F.trim(col)) == 0, 0).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    )
    bpe = F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return df.withColumn("ws_tokens", ws.cast("long")).withColumn(
        "bpe_tokens", bpe.cast("long")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text — the exact-dedup key (stable across Spark and DuckDB)."""
    norm = F.lower(F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")))
    return df.withColumn("fp", F.md5(norm))


# ---------------------------------------------------------------------------
# C4-style webtext cleaning (Raffel et al. 2020, §2.2 heuristics) + PII scrub
# ---------------------------------------------------------------------------

_TERMINAL_PUNCT = r'[.!?"”]$'
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?\d[\d().\- ]{7,}\d"


def c4_line_filter(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_words: int = 3
) -> DataFrame:
    """C4-style line-level cleaning (pure expressions, no UDF):
    keep only lines that end in terminal punctuation, have ≥ min_words
    words, and do not contain boilerplate markers ("lorem ipsum",
    "javascript", '{'). Returns the cleaned text plus line counters —
    the standard first pass of a webtext training-data pipeline.
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    trimmed = lambda l: F.trim(l)
    keep = lambda l: (
        trimmed(l).rlike(_TERMINAL_PUNCT)
        & (F.size(F.split(trimmed(l), r"\s+")) >= min_words)
        & ~F.lower(l).contains("lorem ipsum")
        & ~F.lower(l).contains("javascript")
        & ~l.contains("{")
    )
    kept = F.filter(lines, keep)
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
    )


def scrub_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII scrubbing (pure expressions): emails → <EMAIL>, phone-shaped
    number runs → <PHONE>, with per-doc match counters. Regexes are
    RE2-compatible so the DuckDB oracle evaluates them identically."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col),
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("scrubbed"),
        F.regexp_count(t, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# rolling-hash document fingerprinting: winnowing (Schleimer et al.,
# SIGMOD 2003 — the MOSS algorithm)
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """(doc, fp, pos) winnowing fingerprints: polynomial rolling hash of
    character k-grams over whitespace-normalized lowercase text, then
    the minimum hash of every sliding window of ``window`` consecutive
    k-gram hashes (rightmost-min tie-break), deduplicated.

    Guarantee (the winnowing theorem): any substring shared between two
    docs of length ≥ k + window − 1 contributes at least one SHARED
    fingerprint — so matching docs meet in a groupBy(fp) with ~1/window
    of the k-gram volume, the classic plagiarism/near-dup index.
    One vectorized Arrow pass per batch (numpy sliding windows).
    """
    import numpy as np
    import pandas as pd

    B = np.uint64(1_000_003)
    powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)  # mod 2^64

    def _fps_one(t: str) -> tuple[np.ndarray, np.ndarray]:
        norm = " ".join((t or "").lower().split())
        codes = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        if len(codes) < k:
            return np.empty(0, np.int64), np.empty(0, np.int32)
        grams = np.lib.stride_tricks.sliding_window_view(codes, k)
        h = (grams * powers[None, :]).sum(axis=1)  # uint64 wrap = mod 2^64
        if len(h) < window:
            sel = np.array([int(np.argmin(h))])
        else:
            wins = np.lib.stride_tricks.sliding_window_view(h, window)
            # rightmost minimum per window (the paper's robust variant)
            rev_arg = window - 1 - np.argmin(wins[:, ::-1], axis=1)
            sel = np.unique(np.arange(len(wins)) + rev_arg)
        return h[sel].astype(np.int64), sel.astype(np.int32)

    def _run(it):
        for pdf in it:
            docs, fps, poss = [], [], []
            for doc, t in zip(pdf[id_col], pdf[text_col]):
                f, p = _fps_one(t)
                docs.extend([doc] * len(f))
                fps.extend(f.tolist())
                poss.extend(p.tolist())
            yield pd.DataFrame({"doc": docs, "fp": fps, "pos": poss})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _run, schema="doc long, fp long, pos int"
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
    min_shared_frac: float | None = None,
) -> DataFrame:
    """Candidate near-dup pairs by shared winnowing fingerprints:
    equi-join on fp (only docs sharing a fingerprint ever meet — the
    same bucket-join shape as MinHash-LSH), ranked by shared count.

    ``min_shared_frac`` filters pairs by the SHARED FRACTION of the
    smaller doc's fingerprint set (``n_shared ≥ frac·min(|A|,|B|)``, a
    containment criterion) instead of an absolute count: an absolute
    ``min_shared`` cut silently drops short near-dups (two identical
    40-char docs have only ~10 fingerprints TOTAL, so they can never
    reach ``min_shared=20``) while letting long boilerplate-sharing
    pairs through; the fraction rule is length-invariant. Costs one
    extra broadcast-sized join against the per-doc fingerprint counts.

    ``max_fp_df`` is the stop-fingerprint cut (the 100 TB guard,
    mirroring ``ngram_jaccard_pairs(max_shingle_df=...)``): a
    fingerprint shared by d docs fans out d² pair rows in the fp
    equi-join BEFORE the min_shared filter can trim anything, so one
    boilerplate fingerprint (licence header, nav bar) re-quadratics the
    plan. With the cut, fingerprints with document frequency >
    ``max_fp_df`` are dropped before the join — boilerplate stops
    counting toward n_shared (the standard web-dedup semantics) and
    per-fp join fan-out is bounded by ``max_fp_df``². Default None =
    exact over all fingerprints (the sf-fixture mode)."""
    # cache: the fingerprint table feeds both self-join sides plus the
    # per-doc counts (and the df-cut when set) — uncached, the Python
    # winnowing pass re-runs once per consumer (3-4× the UDF cost; the
    # same in-query pattern as ngram_jaccard_pairs' sh.cache())
    fps = (
        winnow_fingerprints(df, id_col, text_col, k, window)
        .dropDuplicates(["doc", "fp"])
        .cache()
    )
    if max_fp_df is not None:
        light = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_fp_df)
            .select("fp")
        )
        fps = fps.join(light, "fp")
    a = fps.select(F.col("doc").alias("doc_a"), "fp")
    b = fps.select(F.col("doc").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    if min_shared_frac is not None:
        nfp = fps.groupBy("doc").agg(F.count("*").alias("__nfp"))
        pairs = (
            pairs.join(
                nfp.select(F.col("doc").alias("doc_a"), F.col("__nfp").alias("__nfp_a")),
                "doc_a",
            )
            .join(
                nfp.select(F.col("doc").alias("doc_b"), F.col("__nfp").alias("__nfp_b")),
                "doc_b",
            )
            .filter(
                F.col("n_shared")
                >= F.lit(min_shared_frac) * F.least("__nfp_a", "__nfp_b")
            )
            .select("doc_a", "doc_b", "n_shared")
        )
    return pairs.orderBy(F.desc("n_shared"), "doc_a", "doc_b")


def span_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    unit: str = "token",
) -> DataFrame:
    """Cross-document SPAN duplication stats — the C4 span-dedup /
    train-set-overlap rule family, as per-doc signals: for every
    sliding window of ``n`` consecutive units, a span is a DUPLICATE
    unless this (doc, pos) is the span's first occurrence corpus-wide
    (first = smallest (doc, pos) — deterministic under any
    parallelism).

    - ``unit="token"``, n=13 — the GPT-3/Gopher 13-gram overlap rule
      (Brown et al. 2020 App. C decontamination; Rae et al. 2021):
      whitespace tokens, the standard unit for webtext soup.
    - ``unit="sentence"``, n=3 — the C4 rule verbatim (Raffel et al.
      2020 §2.2: "we discarded all but one of any three-sentence span
      occurring more than once in the data set"); sentences split on
      the RE2-compatible ``[.!?]\\s+`` (consumes the terminator) so a
      DuckDB oracle reproduces it exactly.

    Complements the other dedup families: q14 is whole-doc exact, q43
    is WITHIN-doc repetition; this is the cross-doc partial-overlap
    rule that catches syndicated paragraphs and quoted boilerplate.

    Plan shape (r8): unit split + span build are pure array
    expressions; the only span-level shuffle keys on the 16-byte span
    hash — ONE exchange feeding a row_number window partitioned by the
    hash (first occurrence ⇔ rank 1 under the (doc, pos) order), then
    the per-doc agg. The pre-r8 shape (groupBy(h) min-struct + count,
    joined back onto a second evaluation of the span build) shuffled
    the spans twice and ran the md5 span build twice; the window form
    halves both ("2 Exchange over spans → 1", span build ×1).
    """
    col = F.coalesce(F.col(text_col), F.lit(""))
    if unit == "token":
        norm = lambda s: F.trim(s)
        split_re = r"\s+"
    elif unit == "sentence":
        # strip trailing terminators too: the split consumes '.' only
        # when whitespace FOLLOWS, so without this the final sentence
        # of every doc ("...three.") hashes differently from the same
        # sentence mid-doc ("...three") and end-of-text spans never match
        norm = lambda s: F.regexp_replace(F.trim(s), r"[.!?]+$", "")
        split_re = r"[.!?]\s+"
    else:
        raise ValueError(f"unknown unit {unit!r} (expected 'token' or 'sentence')")
    units = F.filter(
        F.transform(F.split(col, split_re), norm),
        lambda s: F.length(s) > 0,
    )
    base = df.select(F.col(id_col).alias("doc"), units.alias("__s")).withColumn(
        "__n", F.size("__s") - F.lit(n - 1)
    )
    spans = base.filter(F.col("__n") > 0).select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("__n")),
                lambda i: F.md5(F.array_join(F.slice("__s", i, n), " ")),
            )
        ).alias("pos", "h"),
    )
    # a span occurrence is a duplicate iff it is NOT the hash's first
    # (doc, pos) — i.e. its row_number under that order is > 1 (rank 1
    # exists whenever the hash occurs at all, so rn > 1 ⇔ cnt > 1 ∧
    # not-first, the exact pre-r8 predicate)
    w_first = Window.partitionBy("h").orderBy("doc", "pos")
    flagged = spans.withColumn("__rn", F.row_number().over(w_first))
    per_doc = flagged.groupBy("doc").agg(
        F.count("*").alias("n_spans"),
        F.sum((F.col("__rn") > 1).cast("long")).alias("n_dup_spans"),
    )
    empty = base.filter(F.col("__n") <= 0).select(
        "doc",
        F.lit(0).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("n_dup_spans"),
    )
    return (
        per_doc.unionByName(empty)
        .withColumn(
            "dup_span_frac",
            F.round(
                F.when(F.col("n_spans") > 0, F.col("n_dup_spans") / F.col("n_spans")).otherwise(0.0),
                6,
            ),
        )
        .select("doc", "n_spans", "n_dup_spans", "dup_span_frac")
    )


def trigram_entropy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Character-trigram Shannon entropy per doc (bits) — the cheap
    deterministic stand-in for the LM-perplexity quality filters of
    CCNet/Gopher-style pipelines: gibberish and boilerplate-repetition
    both show up as entropy outliers. Pure expressions end to end
    (explode trigrams → count → −Σ p·log2 p), exact ANSI-SQL oracle.
    """
    norm = F.lower(F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")))
    base = df.select(F.col(id_col).alias("doc"), norm.alias("__t")).withColumn(
        "__n", F.length("__t") - F.lit(2)
    )
    tri = base.filter(F.col("__n") > 0).select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("__n")),
                lambda i: F.col("__t").substr(i, F.lit(3)),
            )
        ).alias("tri"),
    )
    counts = tri.groupBy("doc", "tri").agg(F.count("*").alias("c"))
    ent = (
        counts.groupBy("doc")
        .agg(
            F.sum("c").alias("total"),
            F.sum(F.col("c") * F.log2("c")).alias("clogc"),
            F.count("*").alias("n_distinct_tri"),
        )
        .select(
            "doc",
            F.round(F.log2("total") - F.col("clogc") / F.col("total"), 6).alias("entropy_bits"),
            F.col("n_distinct_tri"),
            F.col("total").alias("n_trigrams"),
        )
    )
    empty = base.filter(F.col("__n") <= 0).select(
        "doc",
        F.lit(0.0).alias("entropy_bits"),
        F.lit(0).cast("long").alias("n_distinct_tri"),
        F.lit(0).cast("long").alias("n_trigrams"),
    )
    return ent.unionByName(empty)


def gopher_repetition(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher repetition-removal signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", Table A1) — the standard webtext
    filters for boilerplate- and template-heavy pages:

    - ``dup_line_frac`` — fraction of (non-empty) lines that are
      repeats of an earlier line (1 − distinct/total);
    - ``dup_line_char_frac`` — fraction of line characters contained
      in those excess repeats;
    - ``top_bigram_frac`` — fraction of word-bigram occurrences taken
      by the single most frequent bigram (ties broken by the bigram
      string so both engines pick the same winner).

    Line signals are pure array expressions (no explode); the bigram
    signal follows trigram_entropy's explode→count→agg shape. Exact
    ANSI-SQL oracle (q43).
    """
    col = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(col, "\n"), lambda x: F.length(x) > 0)
    n_lines = F.size(lines)
    n_dist = F.size(F.array_distinct(lines))
    chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    dist_chars = F.aggregate(F.array_distinct(lines), F.lit(0), lambda a, x: a + F.length(x))
    base = df.select(
        F.col(id_col).alias("doc"),
        F.round(
            F.when(n_lines > 0, (n_lines - n_dist) / n_lines.cast("double")).otherwise(0.0), 6
        ).alias("dup_line_frac"),
        F.round(
            F.when(chars > 0, (chars - dist_chars) / chars.cast("double")).otherwise(0.0), 6
        ).alias("dup_line_char_frac"),
        # lower BEFORE stripping, mirroring the q43 oracle: Unicode case
        # mappings can emit combining marks (İ → i + U+0307, a \p{M}),
        # so the two orders tokenize such text differently
        F.filter(
            F.split(F.regexp_replace(F.lower(col), r"[^\p{L}\p{N}_\s]", ""), r"\s+"),
            lambda x: F.length(x) > 0,
        ).alias("__toks"),
    )
    bigrams = base.select(
        "doc",
        F.explode(
            F.filter(
                F.zip_with(
                    "__toks",
                    F.slice(F.col("__toks"), 2, F.greatest(F.size("__toks") - 1, F.lit(1))),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
                lambda x: x.contains(" "),
            )
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc", "bg").agg(F.count("*").alias("c"))
    top = (
        counts.groupBy("doc")
        .agg(
            F.max(F.struct(F.col("c"), F.col("bg"))).alias("__top"),
            F.sum("c").alias("n_bigrams"),
        )
        .select(
            "doc",
            F.round(F.col("__top.c") / F.col("n_bigrams").cast("double"), 6).alias("top_bigram_frac"),
            "n_bigrams",
        )
    )
    out = base.select("doc", "dup_line_frac", "dup_line_char_frac").join(top, "doc", "left")
    return out.select(
        "doc",
        "dup_line_frac",
        "dup_line_char_frac",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
    )
