"""Pure-Python single-process reference mirror.

Mirrors the observable semantics of the reference crawler's scrape path
(/root/reference/src/scrapers/acl_scraper.py) so pytest can compare the
Spark engine against it on the same fixture pages:

- index link extraction = ``soup.select('p.d-sm-flex strong a.align-middle')``
  in document order + front-matter filter (acl_scraper.py:72-75),
- detail extraction = h2#title / p.lead a / div.acl-abstract>span /
  meta[citation_pdf_url] with "N/A" fallbacks and urljoin
  (acl_scraper.py:29-48),
- deterministic *submission* order + limit-before-fetch
  (acl_scraper.py:79-84, :94) — the contract per SURVEY.md §3.1,
- URL-seen membership via an exact set (the reference's anti-join
  semantics, src/search/embedder_chroma.py:56-82).

Implemented with stdlib ``html.parser`` (BeautifulSoup is not installed
here); structurally independent from the vectorized Spark parser in
``operators/parse.py`` so byte-identical agreement is a real check.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from pubcrawler_spark.functions.urltools import canonicalize_one, extract_host


def urljoin_simple(base: str, href: str) -> str:
    """Minimal urljoin for absolute/host-relative/scheme hrefs."""
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", href):
        return href
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)([^?#]*)", base)
    root, basepath = (m.group(1), m.group(2)) if m else ("", base)
    if href.startswith("//"):
        return (base.split(":", 1)[0] + ":" + href) if ":" in base else href
    if href.startswith("/"):
        return root + href
    # relative: resolve against base directory
    basedir = basepath.rsplit("/", 1)[0] + "/" if "/" in basepath else "/"
    return root + basedir + href


@dataclass
class _Node:
    tag: str
    attrs: dict
    text_parts: list = field(default_factory=list)
    children: list = field(default_factory=list)
    parent: "_Node | None" = None


class _MiniDom(HTMLParser):
    """Tiny DOM builder: tag/attrs/children/text with entity unescaping
    (convert_charrefs=True mirrors BeautifulSoup's NavigableString)."""

    VOID = {"meta", "br", "img", "link", "input", "hr"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in self.VOID:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].text_parts.append(data)


def _iter_nodes(node):
    for c in node.children:
        yield c
        yield from _iter_nodes(c)


def _classes(node) -> set[str]:
    return set((node.attrs.get("class") or "").split())


def _get_text(node) -> str:
    parts = list(node.text_parts)
    for c in node.children:
        parts.append(_get_text(c))
    return "".join(parts)


def _get_text_strip(node) -> str:
    """BeautifulSoup get_text(strip=True): join stripped text fragments."""
    frags = []

    def walk(n):
        for p in n.text_parts:
            sp = p.strip()
            if sp:
                frags.append(sp)
        for c in n.children:
            walk(c)

    walk(node)
    return "".join(frags)


def parse_dom(html: bytes | str):
    dom = _MiniDom()
    dom.feed(html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html)
    return dom.root


def extract_index_links(html: bytes | str, page_url: str, year: int | str) -> list[str]:
    """Mirror of acl_scraper.py:72-75: select links in document order,
    filter front-matter, urljoin against the index url."""
    root = parse_dom(html)
    hrefs = []
    for p in _iter_nodes(root):
        if p.tag == "p" and "d-sm-flex" in _classes(p):
            for strong in _iter_nodes(p):
                if strong.tag == "strong":
                    for a in _iter_nodes(strong):
                        if a.tag == "a" and "align-middle" in _classes(a) and "href" in a.attrs:
                            hrefs.append(a.attrs["href"])
    return [
        urljoin_simple(page_url, h)
        for h in hrefs
        if f"{year}.acl-long.0" not in h
    ]


def extract_out_links(html: bytes | str, page_url: str) -> list[str]:
    """Frontier-expansion links from detail pages: ``a.out`` in document
    order (engine convention; the reference has no detail-page fan-out)."""
    root = parse_dom(html)
    return [
        urljoin_simple(page_url, n.attrs["href"])
        for n in _iter_nodes(root)
        if n.tag == "a" and "out" in _classes(n) and "href" in n.attrs
    ]


def extract_record(html: bytes | str, url: str) -> dict:
    """Mirror of acl_scraper.py:29-48 (detail-page record)."""
    root = parse_dom(html)
    title = authors = abstract = "N/A"
    pdf_url = None
    author_parts = []
    for n in _iter_nodes(root):
        if n.tag == "h2" and n.attrs.get("id") == "title":
            title = _get_text_strip(n) or "N/A"
        elif n.tag == "p" and "lead" in _classes(n):
            for a in _iter_nodes(n):
                if a.tag == "a":
                    author_parts.append(_get_text_strip(a))
        elif n.tag == "div" and "acl-abstract" in _classes(n):
            span = next((c for c in n.children if c.tag == "span"), None)
            if span is not None:
                abstract = _get_text_strip(span) or "N/A"
        elif n.tag == "meta" and n.attrs.get("name") == "citation_pdf_url":
            pdf_url = n.attrs.get("content")
    if author_parts:
        authors = ", ".join(author_parts)
    if pdf_url and not pdf_url.startswith("http"):
        pdf_url = urljoin_simple(url, pdf_url)
    paper_id = url.strip("/").split("/")[-1]
    return {
        "id": paper_id,
        "title": title,
        "authors": authors,
        "abstract": abstract,
        "pdf_url": pdf_url,
        "source_url": url,
        "text": f"{title}\n{authors}\n{abstract}",
    }


# ---------------------------------------------------------------------------
# Reference-mirror crawl loop (schedule order + seen membership oracle)
# ---------------------------------------------------------------------------


def _robots_parse(robots_txt: str) -> tuple[list[str], int]:
    """Minimal robots.txt: User-agent: * Disallow prefixes + Crawl-delay
    (ms). Mirrors operators/schedule.parse_robots_rules."""
    active, dis, delay = False, [], 0
    for line in (robots_txt or "").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == "*"
        elif key == "disallow" and active and val:
            dis.append(val)
        elif key == "crawl-delay" and active:
            try:
                delay = int(float(val) * 1000)
            except ValueError:
                pass
    return dis, delay


def _robots_disallowed(robots_txt: str, path: str) -> bool:
    dis, _ = _robots_parse(robots_txt)
    return any(path.startswith(p) for p in dis)


def mirror_crawl(
    pages: dict[str, bytes],
    seeds: list[str],
    robots: dict[str, str],
    host_budget: int,
    max_iterations: int,
    year: int | str,
    index_url_pred,
    iteration_window_ms: int = 60_000,
    max_retries: int = 2,
) -> dict:
    """Single-process crawl over in-memory fixture pages.

    Ordering contract (SURVEY.md §7.5): within an iteration, schedule
    = per-host top-``host_budget`` by (priority desc, depth asc,
    seq asc, url_hash asc), then a deterministic global sequence in
    the same order. Fetch misses re-enter the frontier with decayed
    priority (×0.25) up to ``max_retries`` (X3) and only successful or
    robots-disallowed URLs become "seen". Returns schedule, seen set,
    parsed records.
    """
    from pubcrawler_spark.functions.hashing import murmur3_64

    seen: set[str] = set()
    # frontier rows: (priority, depth, seq, url_canon, url, attempts)
    frontier: list[tuple] = []
    for i, u in enumerate(seeds):
        frontier.append((1.0, 0, i, canonicalize_one(u), u, 0))

    schedule_all: list[dict] = []
    parsed_all: list[dict] = []
    pages_canon = {canonicalize_one(u): (u, h) for u, h in pages.items()}

    for iteration in range(max_iterations):
        # dedup within frontier + against seen
        cand: dict[str, tuple] = {}
        for row in sorted(
            frontier, key=lambda t: (-t[0], t[1], t[2], murmur3_64(t[3].encode()))
        ):
            if row[3] not in seen and row[3] not in cand:
                cand[row[3]] = row
        # robots filter
        allowed = []
        for prio, depth, seq, canon, u, attempts in cand.values():
            host = extract_host(canon)
            path = "/" + canon.split("://", 1)[-1].split("/", 1)[-1] if "://" in canon else canon
            if _robots_disallowed(robots.get(host, ""), path):
                seen.add(canon)  # disallowed URLs never retried
                continue
            allowed.append((prio, depth, seq, canon, u, attempts, host))
        # per-host politeness budget then global order
        by_host: dict[str, list] = {}
        for row in sorted(
            allowed,
            key=lambda t: (-t[0], t[1], t[2], murmur3_64(t[3].encode())),
        ):
            by_host.setdefault(row[6], []).append(row)
        picked = []
        for host, rows in by_host.items():
            # Crawl-delay caps per-host slots (≙ host_budgets_from_robots)
            _, delay_ms = _robots_parse(robots.get(host, ""))
            budget = host_budget
            if delay_ms > 0:
                budget = min(host_budget, max(1, iteration_window_ms // delay_ms))
            picked.extend(rows[:budget])
        picked.sort(key=lambda t: (-t[0], t[1], t[2], murmur3_64(t[3].encode())))

        if not picked:
            break

        next_frontier = []
        for gseq, (prio, depth, seq, canon, u, attempts, host) in enumerate(picked):
            schedule_all.append(
                {"iteration": iteration, "seq": gseq, "url_canon": canon, "host": host, "priority": prio}
            )
            hit = pages_canon.get(canon)
            if hit is None:
                # fetch miss (X3): retry with decayed priority, bounded
                if attempts < max_retries:
                    next_frontier.append((prio * 0.25, depth, seq, canon, u, attempts + 1))
                continue
            seen.add(canon)  # only successful fetches become seen
            page_url, html = hit
            if index_url_pred(page_url):
                links = extract_index_links(html, page_url, year)
            else:
                rec = extract_record(html, page_url)
                rec["url_canon"] = canon
                parsed_all.append(rec)
                links = extract_out_links(html, page_url)
            for li, link in enumerate(links):
                # child seq from the parent's GLOBAL schedule seq (gseq):
                # bounded per iteration — the raw discovery-seq chain
                # overflows int64 at depth ≥3 (engine mirrors this)
                next_frontier.append(
                    (prio * 0.5, depth + 1, gseq * 100_000 + li, canonicalize_one(link), link, 0)
                )
        # unpicked candidates stay in the frontier for the next iteration
        picked_set = {r[3] for r in picked}
        leftover = [r[:6] for r in allowed if r[3] not in picked_set]
        frontier = leftover + next_frontier

    return {"schedule": schedule_all, "seen": seen, "parsed": parsed_all}
