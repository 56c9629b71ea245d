"""URL canonicalization + hashing (RFC-3986-style, vectorized).

North-star contract (BASELINE.json): each iteration canonicalizes and
hashes candidate URLs — RFC-3986 normalize, strip tracking params,
murmur3 hash — via vectorized Arrow UDFs. The reference only does
``urljoin`` (/root/reference/src/scrapers/acl_scraper.py:74, :43);
this module is the mandated superset.

Normalization rules (applied by :func:`canonicalize_batch`):

1. scheme + host lowercased; userinfo preserved.
2. default ports stripped (``:80`` http, ``:443`` https).
3. fragment stripped.
4. dot-segments resolved (``/a/./b/../c`` → ``/a/c``).
5. tracking query params removed (``utm_*``, ``ref``, ``fbclid``,
   ``gclid``, ``mc_cid``, ``mc_eid``, ``igshid``); remaining params
   sorted bytewise; empty query → no ``?``.
6. empty path on an authority URL → ``/``.

The heavy path (scheme/host/port/fragment) is pure vectorized pandas
``.str`` ops; query cleaning and dot-segment resolution run only on the
(deduplicated) minority of rows that need them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from pubcrawler_spark.functions.hashing import murmur3_64_batch

TRACKING_PARAMS = frozenset(
    {"ref", "fbclid", "gclid", "mc_cid", "mc_eid", "igshid", "spm"}
)
_DEFAULT_PORTS = {"http": "80", "https": "443"}

# RFC 3986 appendix B
_URL_RE = r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def _is_tracking(name: str) -> bool:
    return name.lower().startswith("utm_") or name.lower() in TRACKING_PARAMS


def clean_query(query: str) -> str:
    """Drop tracking params, sort the rest bytewise. '' if none survive."""
    if not query:
        return ""
    parts = [p for p in query.split("&") if p]
    kept = []
    for p in parts:
        name = p.split("=", 1)[0]
        if not _is_tracking(name):
            kept.append(p)
    kept.sort()
    return "&".join(kept)


def resolve_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash semantics of /. and /..
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    # an absolute path can collapse to nothing ('/.', '/..', '/a/..'):
    # RFC 3986 §5.2.4 leaves the root '/' — and without it the result
    # is not idempotent ('http://h/.' → 'http://h' → 'http://h/')
    if not res and path.startswith("/"):
        return "/"
    return res


def canonicalize_one(url: str) -> str:
    """Scalar canonicalizer — used by the pure-Python reference mirror
    and as the oracle for the vectorized batch version."""
    import re

    m = re.match(_URL_RE, url.strip())
    if not m:
        return url.strip()
    scheme, authority, path, query = m.groups()
    scheme = (scheme or "").lower()
    if authority is not None:
        userinfo, _, hostport = authority.rpartition("@")
        host, colon, port = hostport.partition(":")
        host = host.lower()
        if colon and port == _DEFAULT_PORTS.get(scheme, None):
            colon, port = "", ""
        authority = (userinfo + "@" if userinfo else "") + host + (":" + port if colon and port else "")
        if not path:
            path = "/"
    if "/." in path or path.startswith(("./", "../")):
        path = resolve_dot_segments(path)
    q = clean_query(query or "")
    result = ""
    if scheme:
        result += scheme + ":"
    if authority is not None:
        result += "//" + authority
    result += path
    if q:
        result += "?" + q
    return result


def extract_host(url: str) -> str:
    import re

    m = re.match(_URL_RE, url.strip())
    if not m or m.group(2) is None:
        return ""
    hostport = m.group(2).rpartition("@")[2]
    return hostport.partition(":")[0].lower()


def canonicalize_batch(urls: pd.Series) -> pd.DataFrame:
    """Vectorized canonicalize: Series[str] -> DataFrame(url_canon, host).

    Fast path is all pandas .str vector ops; slow per-element helpers
    run only on deduplicated rows that contain a query / dot-segments.
    """
    s = urls.fillna("").str.strip()
    parts = s.str.extract(_URL_RE)
    scheme = parts[0].fillna("").str.lower()
    authority = parts[1]  # NaN when no authority
    path = parts[2].fillna("")
    query = parts[3].fillna("")

    has_auth = authority.notna()
    auth = authority.fillna("")
    # split userinfo@host:port (greedy .* == rpartition on last '@';
    # port group is (.*) == partition on FIRST ':' like the scalar
    # canonicalize_one — non-numeric ports and IPv6 literals round-trip
    # unchanged instead of silently dropping the authority)
    a = auth.str.extract(r"^(?:(.*)@)?([^:]*)(?::(.*))?$")
    userinfo = a[0].fillna("")
    host = a[1].fillna("").str.lower()
    port = a[2].fillna("")
    default_port = scheme.map(_DEFAULT_PORTS).fillna("\x00")
    port = port.where(port != default_port, "")
    ui_prefix = (userinfo + "@").where(userinfo != "", "")
    port_suffix = (":" + port).where(port != "", "")
    auth_canon = ui_prefix + host + port_suffix
    path = path.where(~(has_auth & (path == "")), "/")

    needs_dots = path.str.contains("/.", regex=False) | path.str.match(r"\.\.?/")
    if needs_dots.any():
        sub = path[needs_dots]
        path = path.copy()
        path[needs_dots] = sub.map({v: resolve_dot_segments(v) for v in sub.unique()})

    q = pd.Series("", index=s.index, dtype=object)
    has_q = query != ""
    if has_q.any():
        sub = query[has_q]
        q[has_q] = sub.map({v: clean_query(v) for v in sub.unique()})

    scheme_part = (scheme + ":").where(scheme != "", "")
    slashes = pd.Series(np.where(has_auth, "//", ""), index=s.index)
    canon = (
        scheme_part
        + slashes
        + auth_canon.where(has_auth, "")
        + path
        + ("?" + q).where(q != "", "")
    )
    return pd.DataFrame({"url_canon": canon, "host": host.where(has_auth, "")})


CANON_SCHEMA = StructType(
    [
        StructField("url_canon", StringType()),
        StructField("host", StringType()),
        StructField("url_hash", LongType()),
    ]
)


@F.pandas_udf(CANON_SCHEMA)
def canonicalize_udf(urls: pd.Series) -> pd.DataFrame:
    """Arrow UDF: url -> struct(url_canon, host, url_hash[murmur3_64])."""
    out = canonicalize_batch(urls)
    out["url_hash"] = murmur3_64_batch(out["url_canon"].tolist())
    return out


def with_canonical_url(df, url_col: str = "url"):
    """Attach url_canon / host / url_hash columns in one Python round-trip."""
    tmp = df.withColumn("__c", canonicalize_udf(F.col(url_col)))
    return (
        tmp.withColumn("url_canon", F.col("__c.url_canon"))
        .withColumn("host", F.col("__c.host"))
        .withColumn("url_hash", F.col("__c.url_hash"))
        .drop("__c")
    )
