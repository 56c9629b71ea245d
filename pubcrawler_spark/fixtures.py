"""Deterministic synthetic `pages` fixtures (FIXTURES.md §1).

Input table shape is authoritative from BASELINE.json ``input_hint``:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Generation is seeded (numpy default_rng(42)), pure Python + numpy, no
network, no external data. Host URL counts are Zipf-skewed (one hot
host ≈30% of rows) to exercise politeness salting; ~5% of rows carry
tracking-param duplicate URLs to exercise canonicalization; every 7th
host's robots.txt disallows ``/private/`` and ~3% of detail pages live
under it (non-zero skipped_robots expected).

HTML mirrors the reference's selector contract
(/root/reference/src/scrapers/acl_scraper.py:31-41, :72):
``h2#title``, ``p.lead a``, ``div.acl-abstract > span``,
``meta[name=citation_pdf_url]``, index links
``p.d-sm-flex strong a.align-middle``.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

import numpy as np

YEAR = 2024
_EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

_TITLE_VOCAB = [
    "diffusion model", "rlhf", "graph neural network", "vision transformer",
    "reasoning", "alignment", "retrieval-augmented", "federated learning",
    "object detection", "machine translation", "policy gradient",
    "contrastive learning", "time series", "adversarial attack",
    "mixture of experts", "gaussian splatting", "code generation", "mamba",
]
_FILLER = [
    "scalable", "efficient", "robust", "unified", "adaptive", "sparse",
    "hierarchical", "generalized", "neural", "probabilistic",
]
_SURNAMES = [
    "Chen", "Wang", "Smith", "Garcia", "Kumar", "Müller", "Tanaka", "Li",
    "Johnson", "Silva", "Dubois", "Novak", "O'Brien & Sons",  # entity case
]


@dataclass
class PagesFixture:
    rows: list  # dicts: url, warc_ts, html(bytes), text, lang
    seeds: list  # index-page urls in task order
    robots: dict  # host -> robots.txt str
    hosts: list


def _detail_html(
    title: str, authors: list[str], abstract: str, pdf_href: str,
    outlinks: list[str], filler: str = "",
) -> str:
    esc = lambda s: (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    author_html = ", ".join(
        f'<a href="/people/{i}">{esc(a)}</a>' for i, a in enumerate(authors)
    )
    out_html = "".join(f'<a class="out" href="{h}">more</a>\n' for h in outlinks)
    return (
        "<!DOCTYPE html>\n<html><head>\n"
        f'<meta name="citation_pdf_url" content="{pdf_href}">\n'
        "<title>fixture page</title>\n</head><body>\n"
        f'<section><h2 id="title"> {esc(title)} </h2></section>\n'
        f'<p class="lead">{author_html}</p>\n'
        f'<div class="acl-abstract"><span>{esc(abstract)}</span></div>\n'
        f"{filler}"
        f'<div class="links">\n{out_html}</div>\n'
        "</body></html>\n"
    )


def _index_html(hrefs: list[str], year: int) -> str:
    # first entry is the front-matter link that must be filtered out
    # (acl_scraper.py:74-75)
    items = [f"{year}.acl-long.0"] + hrefs
    rows = "".join(
        f'<p class="d-sm-flex"><strong><a class="align-middle" href="{h}">entry</a></strong></p>\n'
        for h in items
    )
    return f"<!DOCTYPE html>\n<html><body>\n{rows}</body></html>\n"


def generate_pages(
    n_pages: int = 2000, seed: int = 42, filler_kb: float = 0.0, max_outlinks: int = 2
) -> PagesFixture:
    """Build the deterministic fixture corpus.

    Layout: H hosts with Zipf(1.2)-skewed page counts. Each host gets
    one index page listing its first-wave detail pages; detail pages
    carry out-links to other same-host detail pages (second-wave
    frontier expansion) and ~3% live under /private/.

    ``filler_kb`` pads each detail page with Common-Crawl-sized boiler
    content (bench realism: parse scans real bytes; does not change the
    extracted record). ``max_outlinks`` sizes the frontier fan-out.
    """
    rng = np.random.default_rng(seed)
    filler = ""
    if filler_kb > 0:
        unit = '<p class="filler">the quick brown fox jumps over the lazy web page </p>\n'
        filler = unit * max(1, int(filler_kb * 1024 / len(unit)))
    n_hosts = max(4, n_pages // 120)
    # Zipf-ish weights, forced hot head ~30%
    w = 1.0 / np.arange(1, n_hosts + 1) ** 1.2
    w[0] = w.sum() * 0.42  # ≈30% of total after renorm
    w = w / w.sum()
    per_host = np.maximum(1, (w * n_pages).astype(int))

    rows, seeds, robots = [], [], {}
    hosts = [f"host{k}.example.org" for k in range(n_hosts)]
    gi = 0  # global page index for ts/lang determinism

    for k, host in enumerate(hosts):
        n = int(per_host[k])
        base = f"https://{host}/{YEAR}"
        if k % 7 == 0:
            robots[host] = "User-agent: *\nDisallow: /private/\n"
        if k % 11 == 0:
            robots[host] = robots.get(host, "User-agent: *\n") + "Crawl-delay: 2\n"

        detail_urls, detail_specs = [], []
        for i in range(n):
            private = rng.random() < 0.03
            path = f"/private/{YEAR}" if private else f"/{YEAR}"
            url = f"https://{host}{path}/paper{i}.html"
            detail_urls.append(url)
            title_kw = _TITLE_VOCAB[int(rng.integers(len(_TITLE_VOCAB)))]
            adj = _FILLER[int(rng.integers(len(_FILLER)))]
            title = f"{adj.title()} {title_kw.title()} for {_FILLER[int(rng.integers(len(_FILLER)))]} tasks"
            n_auth = int(rng.integers(1, 4))
            authors = [str(_SURNAMES[int(rng.integers(len(_SURNAMES)))]) for _ in range(n_auth)]
            kws = rng.choice(len(_TITLE_VOCAB), size=3, replace=False)
            abstract = (
                f"We study {_TITLE_VOCAB[kws[0]]} and {_TITLE_VOCAB[kws[1]]} with "
                f"{_TITLE_VOCAB[kws[2]]} at scale."
            )
            rel_pdf = rng.random() < 0.5
            pdf_href = f"/pdf/paper{i}.pdf" if rel_pdf else f"https://cdn.{host}/paper{i}.pdf"
            detail_specs.append((url, title, authors, abstract, pdf_href, private))

        # out-links: each detail page links to up to max_outlinks same-host pages
        for i, (url, title, authors, abstract, pdf_href, private) in enumerate(detail_specs):
            n_out = int(rng.integers(0, max_outlinks + 1))
            outs = [
                detail_urls[int(rng.integers(len(detail_urls)))]
                for _ in range(n_out)
            ]
            html = _detail_html(title, authors, abstract, pdf_href, outs, filler)
            rec_title = title.strip()
            text = f"{rec_title}\n{', '.join(authors)}\n{abstract}"
            url_out = url
            if rng.random() < 0.05:  # tracking-param duplicate URL
                url_out = url + "?utm_source=feed&ref=rss"
            rows.append(
                {
                    "url": url_out,
                    "warc_ts": _EPOCH + dt.timedelta(seconds=17 * gi),
                    "html": html.encode("utf-8"),
                    "text": text,
                    "lang": "zh" if gi % 20 == 18 else ("de" if gi % 20 == 19 else "en"),
                }
            )
            gi += 1

        # index page lists one dead link (a URL with no page row — the
        # fetch-miss/retry path, SURVEY X3) followed by the first ~2/3
        # of detail pages as relative hrefs
        first_wave = [s[0] for s in detail_specs]
        hrefs = [f"/{YEAR}/dead{k}.html"] + [
            u.replace(f"https://{host}", "") for u in first_wave[: max(1, n * 2 // 3)]
        ]
        index_url = f"{base}/index.html"
        rows.append(
            {
                "url": index_url,
                "warc_ts": _EPOCH + dt.timedelta(seconds=17 * gi),
                "html": _index_html(hrefs, YEAR).encode("utf-8"),
                "text": "",
                "lang": "en",
            }
        )
        gi += 1
        seeds.append(index_url)

    return PagesFixture(rows=rows, seeds=seeds, robots=robots, hosts=hosts)


PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_spark_df(spark, fixture: PagesFixture):
    return spark.createDataFrame(fixture.rows, schema=PAGES_DDL)


def robots_spark_df(spark, fixture: PagesFixture):
    data = [(h, t) for h, t in sorted(fixture.robots.items())]
    return spark.createDataFrame(data, schema="host string, robots_txt string")


def is_index_url(url: str) -> bool:
    return url.endswith("/index.html")
