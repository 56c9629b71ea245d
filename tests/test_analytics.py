"""Reference-semantics tests for the analytics layer (SURVEY.md §2.4/§2.5):
Spark results vs a pandas mirror of trends.py/analyzer.py on a synthetic
papers fixture (FIXTURES.md §3 shape)."""

from __future__ import annotations

import re

import numpy as np
import pytest

from pubcrawler_spark.operators import analytics

DECISIONS = ["Oral", "Spotlight", "Poster", "Reject", "N/A"]


@pytest.fixture(scope="module")
def papers(spark):
    rng = np.random.default_rng(42)
    kws = ["diffusion model", "rlhf", "graph neural network", "vision transformer",
           "reasoning", "federated learning", "time series", "transformer"]
    rows = []
    for i in range(400):
        k1, k2 = rng.choice(len(kws), 2, replace=False)
        title = f"A study of {kws[k1]} methods"
        abstract = (
            "N/A (摘要需访问详情页)" if rng.random() < 0.08
            else f"We explore {kws[k2]} and {kws[k1]} at scale."
        )
        decision = DECISIONS[int(rng.choice(5, p=[0.10, 0.15, 0.45, 0.25, 0.05]))]
        ratings = rng.integers(1, 11, size=int(rng.integers(2, 6)))
        rows.append(
            (title, "Alice Chen, Bob Li", abstract, f"https://x.org/{i}.pdf",
             f"https://x.org/{i}", str(i), 2022 + i % 4,
             ["ICLR", "NeurIPS", "ICML"][i % 3], decision,
             round(float(np.mean(ratings)), 2), [int(r) for r in ratings])
        )
    df = spark.createDataFrame(
        rows,
        "title string, authors string, abstract string, pdf_url string, "
        "source_url string, id string, year int, conference string, "
        "decision string, avg_rating double, review_ratings array<int>",
    )
    return df, rows


def _mirror_classify(title, abstract):
    """trends.py:28-40 mirror."""
    text = f"{title} {abstract}".lower()
    out = set()
    for name, kws in analytics.TREND_TAXONOMY.items():
        pat = r"\b(" + "|".join(re.escape(k) for k in kws) + r")\b"
        if re.search(pat, text, re.IGNORECASE):
            out.add(name)
    return out


def test_classify_matches_reference_mirror(spark, papers):
    df, rows = papers
    got = {
        r["id"]: set(r["sub_fields"])
        for r in analytics.classify_subfields(df).select("id", "sub_fields").collect()
    }
    for row in rows:
        want = _mirror_classify(row[0], row[2])
        assert got[row[5]] == want, (row[0], row[2], got[row[5]], want)


def test_topic_stats_matches_pandas_mirror(spark, papers):
    import pandas as pd

    df, rows = papers
    exploded = analytics.explode_subfields(analytics.classify_subfields(df))
    got = {r["topic_name"]: r.asDict() for r in analytics.topic_stats(exploded).collect()}

    pdf = pd.DataFrame(rows, columns=[
        "title", "authors", "abstract", "pdf_url", "source_url", "id",
        "year", "conference", "decision", "avg_rating", "review_ratings"])
    pdf["sub_fields"] = [
        list(_mirror_classify(t, a)) for t, a in zip(pdf["title"], pdf["abstract"])
    ]
    ex = pdf.explode("sub_fields").dropna(subset=["sub_fields"])
    want_counts = ex.groupby("sub_fields").size()
    want_means = ex.groupby("sub_fields")["avg_rating"].mean()
    dec = ex.groupby(["sub_fields", "decision"]).size().unstack(fill_value=0)
    for d in DECISIONS:
        if d not in dec.columns:
            dec[d] = 0
    accepted = dec["Oral"] + dec["Spotlight"] + dec["Poster"]
    total = accepted + dec["Reject"]
    want_rate = (accepted / total.where(total != 0, np.nan)).fillna(0)

    assert set(got) == set(want_counts.index)
    for topic in want_counts.index:
        g = got[topic]
        assert g["paper_count"] == want_counts[topic]
        assert abs(g["avg_rating"] - want_means[topic]) < 1e-9
        for d in DECISIONS:
            assert g[analytics._dcol(d)] == dec.loc[topic, d]
        assert abs(g["acceptance_rate"] - want_rate[topic]) < 1e-9


def test_keyword_filter_matches_reference(spark, papers):
    df, rows = papers
    filters = ["rlhf", "diffusion model"]
    got = {r["id"] for r in analytics.keyword_filter(df, filters).select("id").collect()}
    # run_crawler.py:92-100 mirror
    pat = re.compile("|".join(filters), re.IGNORECASE)
    want = {row[5] for row in rows if pat.search(f"{row[0]} {row[2]}")}
    assert got == want


def test_word_frequency_matches_reference(spark, papers):
    from collections import Counter

    df, rows = papers
    got = {(r["word"], r["cnt"]) for r in analytics.word_frequency(df).collect()}
    # analyzer.py:39-44 mirror
    full = " ".join(f"{r[0]} {r[2]}" for r in rows)
    toks = re.sub(r"[^\w\s]", "", full.lower()).split()
    stop = set(analytics.ALL_STOPWORDS)
    counts = Counter(
        w for w in toks if w.isalpha() and len(w) > 2 and w not in stop
    )
    assert got == set(counts.items())


def test_distribution_most_common_order(spark, papers):
    df, _ = papers
    rows = analytics.distribution(df).collect()
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(counts) == 400


def test_c4_line_filter_and_pii_scrub(spark):
    from pubcrawler_spark.operators import textstats

    df = spark.createDataFrame([
        (1, "Good line with punctuation.\nshort.\nno terminal punct here\n"
            "Contains javascript code.\nAnother fine sentence!\n{ bad json }"),
        (2, "Mail me at a.b@test.org or call +1 (555) 123-4567 now."),
        (3, None),
    ], "doc_id long, text string")
    c4 = {r["doc_id"]: r for r in textstats.c4_line_filter(df).collect()}
    assert c4[1]["clean_text"] == "Good line with punctuation.\nAnother fine sentence!"
    assert (c4[1]["n_lines"], c4[1]["n_lines_kept"]) == (6, 2)
    assert c4[3]["clean_text"] == "" and c4[3]["n_lines_kept"] == 0
    pii = {r["doc_id"]: r for r in textstats.scrub_pii(df).collect()}
    assert pii[2]["scrubbed"] == "Mail me at <EMAIL> or call <PHONE> now."
    assert (pii[2]["n_emails"], pii[2]["n_phones"]) == (1, 1)
    assert pii[1]["n_emails"] == 0


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing theorem: docs sharing a substring >= k+window-1 chars
    share >= 1 fingerprint; disjoint-vocabulary docs share none."""
    from pubcrawler_spark.operators import textstats

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, "intro words before. " + shared + " and trailing content here"),
        (2, shared + " with a completely different ending altogether"),
        (3, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {doc: set() for doc in (1, 2, 3)}
    for r in textstats.winnow_fingerprints(df, k=8, window=4).collect():
        fps[r["doc"]].add(r["fp"])
    assert fps[1] & fps[2], "shared substring must produce shared fingerprints"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # deterministic across recomputation
    again = {doc: set() for doc in (1, 2, 3)}
    for r in textstats.winnow_fingerprints(df, k=8, window=4).collect():
        again[r["doc"]].add(r["fp"])
    assert again == fps
    # pair ranking surfaces exactly the planted pair
    pairs = textstats.winnow_pairs(df, k=8, window=4, min_shared=2).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 2)]


def test_gopher_repetition_planted(spark):
    """Planted boilerplate: a doc that repeats one line and one bigram
    scores high on all three Gopher signals; a clean doc scores 0."""
    from pubcrawler_spark.operators import textstats

    rows = [
        # 4 lines, 3 of them identical; bigram "buy now" dominates
        (0, "buy now buy now buy now\nbuy now buy now buy now\nbuy now buy now buy now\nunique closing line"),
        # all-distinct lines, every bigram unique
        (1, "alpha beta\ngamma delta\nepsilon zeta"),
        (2, ""),  # empty doc: all signals 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: r for r in textstats.gopher_repetition(df).collect()}
    assert got[0]["dup_line_frac"] == 0.5  # 2 excess copies / 4 lines
    assert got[0]["dup_line_char_frac"] > 0.5
    # doc 0 has 21 tokens -> 20 bigram occurrences; "buy now" takes 9
    assert got[0]["top_bigram_frac"] == round(9 / 20, 6)
    assert got[0]["n_bigrams"] == 20
    assert got[1]["dup_line_frac"] == 0.0
    assert got[1]["dup_line_char_frac"] == 0.0
    # every bigram occurs once; winner is the max-string tie-break
    assert got[1]["top_bigram_frac"] == 0.2
    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.0
    assert got[2]["n_bigrams"] == 0


def test_c4_span_stats_planted(spark):
    """Planted cross-doc duplication: docs 1 and 2 share a 3-sentence
    run; the first occurrence (doc 1) is kept, doc 2's copy is flagged;
    a short doc (<3 sentences) degrades to zero spans."""
    from pubcrawler_spark.operators import textstats

    shared = "Alpha one. Beta two. Gamma three."
    rows = [
        (1, shared + " Delta four. Epsilon five."),
        (2, "Intro sentence here. " + shared),
        (3, "Unique text only. Nothing shared at all. Third sentence here."),
        (4, "Too short. Really."),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc: (r.n_spans, r.n_dup_spans, r.dup_span_frac)
           for r in textstats.span_dedup_stats(df, n=3, unit="sentence").collect()}
    # doc1: 5 sentences -> 3 spans, all first occurrences
    assert got[1] == (3, 0, 0.0)
    # doc2: 4 sentences -> 2 spans; the (shared s1,s2,s3) span at pos 2
    # duplicates doc1's pos-1 span
    assert got[2][0] == 2 and got[2][1] == 1
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)  # 2 sentences -> no 3-span
    assert got[5] == (0, 0, 0.0)
