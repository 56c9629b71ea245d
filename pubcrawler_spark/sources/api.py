"""Source adapters for API-backed scrapers (SURVEY.md S4/S5/S6).

The reference talks to live services (arXiv Atom API, OpenReview
client, IEEE paginated REST); the engine treats each as a *source
adapter*: payloads arrive as rows (offline fixtures here; at scale an
ingest job lands them in the pages/payloads table) and are parsed
batch-wise:

- :func:`parse_arxiv_atom` — Atom XML → records via stdlib ElementTree
  inside a pandas UDF (F16: no native XML in stock PySpark). Mirrors
  arxiv_scraper.py:30-49 field extraction: id from ``/abs/`` tail,
  title/summary whitespace-normalized, authors comma-joined,
  categories, pdf link rel.
- :func:`parse_openreview_notes` — JSON notes → records with review
  ratings via ``from_json`` + pure expressions (F15); ``avg_rating`` =
  round(mean(ratings), 2) (iclr_scraper.py:105, A7/F12).
- :func:`paginated_rest_scan` — cursor loop over numbered pages until
  ``totalPages`` or limit (tpami_scraper.py:63-116, S6): iterative
  micro-batch with the cursor in driver state; each page's JSON parses
  JVM-side.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_ATOM = "{http://www.w3.org/2005/Atom}"

ARXIV_RECORD_DDL = (
    "id string, title string, authors string, summary string, "
    "pdf_url string, source_url string, categories array<string>, "
    "primary_category string"
)


def _clean(s: str | None) -> str:
    # arxiv_scraper.py:33: `.replace('\n', ' ').strip()` then collapse
    return re.sub(r"\s+", " ", (s or "")).strip()


def parse_arxiv_atom(df: DataFrame, xml_col: str = "payload") -> DataFrame:
    """Batch Atom-feed parsing: one payload row may hold many entries →
    returns one row per entry (explode of the parsed array)."""

    @F.pandas_udf(f"array<struct<{ARXIV_RECORD_DDL}>>")
    def _parse(payloads: pd.Series) -> pd.Series:
        out = []
        for xml in payloads:
            entries = []
            try:
                root = ET.fromstring(xml)
            except ET.ParseError:
                out.append(entries)
                continue
            for e in root.findall(f"{_ATOM}entry"):
                url = _clean(e.findtext(f"{_ATOM}id"))
                pdf = None
                for link in e.findall(f"{_ATOM}link"):
                    if link.get("title") == "pdf":
                        pdf = link.get("href")
                cats = [c.get("term") for c in e.findall(f"{_ATOM}category")]
                prim = e.find("{http://arxiv.org/schemas/atom}primary_category")
                entries.append(
                    {
                        "id": url.split("/abs/")[-1],
                        "title": _clean(e.findtext(f"{_ATOM}title")),
                        "authors": ", ".join(
                            _clean(a.findtext(f"{_ATOM}name"))
                            for a in e.findall(f"{_ATOM}author")
                        ),
                        "summary": _clean(e.findtext(f"{_ATOM}summary")),
                        "pdf_url": pdf,
                        "source_url": url,
                        "categories": cats,
                        "primary_category": prim.get("term") if prim is not None else None,
                    }
                )
            out.append(entries)
        return pd.Series(out)

    return df.withColumn("__entries", _parse(F.col(xml_col))).select(
        F.explode("__entries").alias("r")
    ).select("r.*")


OPENREVIEW_NOTE_SCHEMA = (
    "id string, content struct<title:string, abstract:string, "
    "authors:array<string>, pdf:string>, "
    "details struct<ratings:array<int>, decision:string>"
)


def parse_openreview_notes(df: DataFrame, json_col: str = "payload") -> DataFrame:
    """JSON note → reference record shape (iclr_scraper.py:77-105):
    authors ', '-joined, avg_rating = round(mean(ratings), 2)."""
    parsed = df.select(F.from_json(F.col(json_col), OPENREVIEW_NOTE_SCHEMA).alias("n"))
    ratings = F.col("n.details.ratings")
    avg = F.when(
        ratings.isNotNull() & (F.size(ratings) > 0),
        F.round(
            F.aggregate(ratings, F.lit(0.0), lambda a, x: a + x) / F.size(ratings), 2
        ),
    )
    return parsed.select(
        F.col("n.id").alias("id"),
        F.col("n.content.title").alias("title"),
        F.array_join("n.content.authors", ", ").alias("authors"),
        F.col("n.content.abstract").alias("abstract"),
        F.col("n.content.pdf").alias("pdf_url"),
        F.col("n.details.decision").alias("decision"),
        avg.alias("avg_rating"),
        ratings.alias("review_ratings"),
    )


def paginated_rest_scan(
    spark: SparkSession,
    fetch_page: Callable[[int], tuple[str, int]],
    record_schema: str,
    records_path: str = "records",
    limit: int | None = None,
) -> DataFrame:
    """Cursor loop (S6): call ``fetch_page(page_no) -> (json, total_pages)``
    until exhausted or ``limit`` records collected; parse each page's
    payload JVM-side. The cursor is driver state (checkpointable as a
    single int — the reference holds it in a local, tpami_scraper.py:103).
    """
    page, total_pages = 1, 1
    payloads: list[tuple[int, str]] = []
    n = 0
    while page <= total_pages:
        body, total_pages = fetch_page(page)
        payloads.append((page, body))
        n += 1
        if limit is not None and n >= limit:
            break
        page += 1
    raw = spark.createDataFrame(payloads, "page int, payload string")
    return raw.select(
        "page",
        F.explode(
            F.from_json(F.col("payload"), f"struct<{records_path}: array<struct<{record_schema}>>>")[records_path]
        ).alias("r"),
    ).select("page", "r.*")
