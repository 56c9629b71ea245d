"""Source adapters (S4/S5/S6) + sinks (K1/K4) tests."""

from __future__ import annotations

import json
import os

import pytest

from pubcrawler_spark import sinks
from pubcrawler_spark.sources import api

ATOM = """<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom" xmlns:arxiv="http://arxiv.org/schemas/atom">
  <entry>
    <id>http://arxiv.org/abs/2401.00001v1</id>
    <title>Scaling  Laws
 for Frontier Crawls</title>
    <summary> We study
   crawl scheduling. </summary>
    <author><name>Ada Lovelace</name></author>
    <author><name>Alan Turing</name></author>
    <link title="pdf" href="http://arxiv.org/pdf/2401.00001v1" rel="related"/>
    <category term="cs.IR"/><category term="cs.DC"/>
    <arxiv:primary_category term="cs.IR"/>
  </entry>
  <entry>
    <id>http://arxiv.org/abs/2401.00002v2</id>
    <title>Second Paper</title>
    <summary>Another.</summary>
    <author><name>Grace Hopper</name></author>
  </entry>
</feed>"""


def test_parse_arxiv_atom(spark):
    df = spark.createDataFrame([(ATOM,)], "payload string")
    rows = {r["id"]: r for r in api.parse_arxiv_atom(df).collect()}
    assert set(rows) == {"2401.00001v1", "2401.00002v2"}
    r = rows["2401.00001v1"]
    # whitespace normalized like arxiv_scraper.py:33
    assert r["title"] == "Scaling Laws for Frontier Crawls"
    assert r["summary"] == "We study crawl scheduling."
    assert r["authors"] == "Ada Lovelace, Alan Turing"
    assert r["pdf_url"] == "http://arxiv.org/pdf/2401.00001v1"
    assert r["categories"] == ["cs.IR", "cs.DC"]
    assert r["primary_category"] == "cs.IR"
    assert rows["2401.00002v2"]["pdf_url"] is None


def test_parse_openreview_notes(spark):
    note = {
        "id": "abc123",
        "content": {
            "title": "Deep Nets",
            "abstract": "We train nets.",
            "authors": ["A One", "B Two"],
            "pdf": "/pdf/abc123.pdf",
        },
        "details": {"ratings": [6, 8, 7], "decision": "Poster"},
    }
    df = spark.createDataFrame([(json.dumps(note),)], "payload string")
    r = api.parse_openreview_notes(df).collect()[0]
    assert r["authors"] == "A One, B Two"
    assert r["avg_rating"] == 7.0  # round(mean([6,8,7]), 2)
    assert r["decision"] == "Poster"
    assert r["review_ratings"] == [6, 8, 7]


def test_paginated_rest_scan(spark):
    pages = {
        1: json.dumps({"records": [{"id": "a", "title": "T1"}, {"id": "b", "title": "T2"}]}),
        2: json.dumps({"records": [{"id": "c", "title": "T3"}]}),
    }

    calls = []

    def fetch(page):
        calls.append(page)
        return pages[page], 2

    out = api.paginated_rest_scan(spark, fetch, "id string, title string")
    rows = sorted((r["page"], r["id"]) for r in out.collect())
    assert rows == [(1, "a"), (1, "b"), (2, "c")]
    assert calls == [1, 2]  # cursor advanced until totalPages


def test_csv_sink_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [("T", "A", "Abs", "p.pdf", "http://x", "id1", 2024, "ICLR")],
        "title string, authors string, abstract string, pdf_url string, "
        "source_url string, id string, year int, conference string",
    )
    out = str(tmp_path / "csv")
    sinks.write_papers_csv(df, out)
    # partition dirs exist (the (conf, year) layout of formatter.py)
    assert os.path.isdir(os.path.join(out, "conference=ICLR", "year=2024"))
    back = spark.read.option("header", True).csv(out)
    # preferred columns lead the header order (formatter.py:107-109)
    assert back.columns[:4] == ["title", "authors", "abstract", "pdf_url"]


def test_posting_table_and_lookup(spark):
    df = spark.createDataFrame(
        [("d1", "Vision Transformers", "Ada", "We study vision."),
         ("d2", "Graph Nets", "Bob", "Nets for graphs.")],
        "id string, title string, authors string, abstract string",
    )
    postings = sinks.build_posting_table(df, "id")
    hit = {r["doc"] for r in sinks.term_lookup(postings, "vision", col="title").collect()}
    assert hit == {"d1"}
    both = {r["doc"] for r in sinks.term_lookup(postings, "nets").collect()}
    assert both == {"d2"}  # 'nets' appears in d2 title+abstract only
    tf = {(r["doc"], r["col"]): r["tf"] for r in postings.filter("term = 'vision'").collect()}
    assert tf[("d1", "abstract")] == 1 and tf[("d1", "title")] == 1


def test_sanitize_filename(spark):
    df = spark.createDataFrame(
        [('A/B: "Quoted" <Title>? x*y|z\\w',), ("t" * 150,), ("plain title",)],
        "title string",
    )
    got = [r[0] for r in df.select(sinks.sanitize_filename(sinks.F.col("title"))).collect()]
    # reference re.sub(r'[\\/*?:"<>|]', "") + 100-char truncate + '.pdf'
    import re
    want = []
    for t in ['A/B: "Quoted" <Title>? x*y|z\\w', "t" * 150, "plain title"]:
        s = re.sub(r'[\\/*?:"<>|]', "", t)
        want.append((s[:100] + ".pdf") if len(s) > 100 else (s + ".pdf"))
    assert got == want


def test_file_catalog_classifier(spark, tmp_path):
    """S9: path-pattern classification mirrors streamlit_app.py:103-127."""
    import os

    from pubcrawler_spark.sources import catalog

    meta = tmp_path / "metadata"
    trends = tmp_path / "trends"
    files = {
        # rule 1: summary table under analysis/
        meta / "ACL" / "2024" / "analysis" / "4_summary_table_final.csv": ("summary_table", "ACL", "2024"),
        # rule 2: raw data dump
        meta / "ICLR" / "2023" / "papers_data_main.csv": ("raw_data", "ICLR", "2023"),
        # rule 3: other analysis file
        meta / "CVPR" / "2022" / "analysis" / "topic_trends.csv": ("analysis_other", "CVPR", "2022"),
        # rule 4: trends/<conf>/x.csv
        trends / "NeurIPS" / "keyword_trends.csv": ("trends", "NeurIPS", "Cross-Year"),
    }
    for p in files:
        os.makedirs(p.parent, exist_ok=True)
        p.write_text("a,b\n1,2\n")
    # unclassifiable files are dropped (too-shallow path / wrong depth)
    (meta / "stray.csv").write_text("x\n")
    (trends / "too" / "deep" / "nested.csv").parent.mkdir(parents=True)
    (trends / "too" / "deep" / "nested.csv").write_text("x\n")

    listed = catalog.list_csv_files(spark, str(meta), str(trends))
    got = {
        r["path"]: (r["csv_type"], r["conference"], r["year"])
        for r in catalog.classify_output_files(listed).collect()
    }
    assert got == {str(p): v for p, v in files.items()}
