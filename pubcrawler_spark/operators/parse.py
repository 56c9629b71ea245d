"""Batch HTML extraction — vectorized pandas UDF (SURVEY.md P1/V3).

Semantics mirror the reference detail-page parser
(/root/reference/src/scrapers/acl_scraper.py:29-48):

- ``title``   = text of ``h2#title``, stripped, "N/A" fallback
- ``authors`` = ``", ".join`` of ``p.lead a`` texts, "N/A" fallback
- ``abstract``= text of ``div.acl-abstract > span``, "N/A" fallback
- ``pdf_url`` = ``meta[name=citation_pdf_url]@content``, urljoin'd when
  not absolute, NULL fallback
- ``id``      = ``url.strip('/').split('/')[-1]``
- ``text``    = the byte-identical invariant column:
  ``f"{title}\\n{authors}\\n{abstract}"``

Link extraction mirrors acl_scraper.py:72-75 (index pages,
``p.d-sm-flex strong a.align-middle`` in document order + front-matter
filter) plus the engine's ``a.out`` detail-page fan-out convention.

Implementation is pandas ``.str`` regex vector ops over the whole Arrow
batch (no per-row Python beyond list joins on matched fragments),
intentionally independent from the stdlib-HTMLParser reference mirror in
``refmirror.py`` so the byte-identical pytest comparison is meaningful.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

RECORD_DDL = (
    "id string, title string, authors string, abstract string, "
    "pdf_url string, source_url string, text string, links array<string>"
)

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def _unescape(s: pd.Series) -> pd.Series:
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s


def _vec_urljoin(base: pd.Series, href: pd.Series) -> pd.Series:
    """Vectorized minimal urljoin (absolute / host-relative / relative)."""
    root = base.str.extract(r"^([a-zA-Z][\w+.-]*://[^/?#]*)", expand=False).fillna("")
    basedir = base.str.replace(r"[?#].*$", "", regex=True).str.replace(
        r"/[^/]*$", "/", regex=True
    )
    is_abs = href.str.match(r"^[a-zA-Z][\w+.-]*:")
    is_rooted = href.str.startswith("/")
    return href.where(is_abs, (root + href).where(is_rooted, basedir + href))


def parse_pages_batch(urls: pd.Series, htmls: pd.Series, year) -> pd.DataFrame:
    """Vectorized extraction over one Arrow batch."""
    html = pd.Series(
        [b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or "") for b in htmls],
        index=urls.index,
    )
    title = _unescape(
        html.str.extract(r'<h2 id="title">(.*?)</h2>', expand=False).fillna("").str.strip()
    )
    title = title.where(title != "", "N/A")

    lead = html.str.extract(r'<p class="lead">(.*?)</p>', expand=False).fillna("")
    author_lists = lead.str.findall(r"<a[^>]*>(.*?)</a>")
    authors = _unescape(
        pd.Series([", ".join(x.strip() for x in lst) for lst in author_lists], index=urls.index)
    )
    authors = authors.where(authors != "", "N/A")

    abstract = _unescape(
        html.str.extract(r'<div class="acl-abstract"><span>(.*?)</span>', expand=False)
        .fillna("")
        .str.strip()
    )
    abstract = abstract.where(abstract != "", "N/A")

    pdf = html.str.extract(r'<meta name="citation_pdf_url" content="([^"]*)"', expand=False)
    needs_join = pdf.notna() & ~pdf.fillna("").str.startswith("http")
    if needs_join.any():
        joined = _vec_urljoin(urls[needs_join], pdf[needs_join])
        pdf = pdf.copy()
        pdf[needs_join] = joined

    paper_id = urls.str.strip("/").str.split("/").str[-1]

    # link extraction: index-page links (document order, front-matter
    # filtered) + detail-page a.out fan-out
    idx_links = html.str.findall(
        r'<p class="d-sm-flex"><strong><a class="align-middle" href="([^"]*)"'
    )
    out_links = html.str.findall(r'<a class="out" href="([^"]*)"')
    fm = f"{year}.acl-long.0"
    links = pd.Series(
        [
            [h for h in il if fm not in h] + ol
            for il, ol in zip(idx_links, out_links)
        ],
        index=urls.index,
    )
    # urljoin each href against its page url (explode → vector join →
    # regroup); positional indexes avoid duplicate-label realignment
    flat = links.explode().dropna()
    if len(flat):
        pos = pd.RangeIndex(len(flat))
        bases = pd.Series(urls.loc[flat.index].to_numpy(), index=pos)
        hrefs = pd.Series(flat.astype(str).to_numpy(), index=pos)
        joined = _vec_urljoin(bases, hrefs)
        joined.index = flat.index
        links = joined.groupby(level=0).agg(list).reindex(urls.index)
    links = pd.Series([x if isinstance(x, list) else [] for x in links], index=urls.index)

    has_record = html.str.contains('<h2 id="title">', regex=False)
    text = title + "\n" + authors + "\n" + abstract
    return pd.DataFrame(
        {
            "id": paper_id.where(has_record, None),
            "title": title.where(has_record, None),
            "authors": authors.where(has_record, None),
            "abstract": abstract.where(has_record, None),
            "pdf_url": pdf.where(has_record, None),
            "source_url": urls.where(has_record, None),
            "text": text.where(has_record, None),
            "links": links,
        }
    )


def parse_pages(df: DataFrame, year, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Attach parsed record struct + links to a pages DataFrame.

    Uses mapInPandas-free pandas_udf returning a struct column so
    Catalyst can prune unused struct fields downstream.
    """

    @F.pandas_udf(RECORD_DDL)
    def _parse(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
        for urls, htmls in it:
            yield parse_pages_batch(urls, htmls, year)

    return df.withColumn("parsed", _parse(F.col(url_col), F.col(html_col)))
