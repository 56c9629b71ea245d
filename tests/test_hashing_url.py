"""Unit tests: vendored murmur3 + URL canonicalization (SURVEY.md P8/P9/V6)."""

from __future__ import annotations

import random
import string

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pubcrawler_spark.functions.hashing import (
    murmur3_64,
    murmur3_64_batch,
    murmur3_x64_128,
)
from pubcrawler_spark.functions.urltools import (
    canonicalize_batch,
    canonicalize_one,
    extract_host,
)


def test_murmur3_known_vectors():
    # canonical x64_128 digest of the fox string is
    # 6c1b07bc7bbc4be347939ac4a93c437a (little-endian h1 ‖ h2)
    h1, h2 = murmur3_x64_128(b"The quick brown fox jumps over the lazy dog")
    digest = h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    assert digest.hex() == "6c1b07bc7bbc4be347939ac4a93c437a"
    assert murmur3_x64_128(b"") == (0, 0)


@given(st.lists(st.text(max_size=80), min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_murmur3_batch_matches_scalar(values):
    batch = murmur3_64_batch(values)
    scalar = np.array([murmur3_64(v.encode()) for v in values], dtype=np.int64)
    assert (batch == scalar).all()


URL_CASES = [
    "https://Example.COM:443/a/b/../c?utm_source=x&b=2&a=1#frag",
    "HTTP://host.org:80/",
    "http://host.org:8080/x?ref=y",
    "https://user:pw@Host.NET/path/./d/",
    "https://acl.org",
    "mailto:someone@example.com",
    "/relative/path",
    "https://h.com/a?z=1&a=2&utm_x=3&fbclid=abc",
    # non-numeric port and IPv6 literal: the authority must round-trip
    # unchanged (vectorized path regression — ADVICE r1)
    "https://host.org:abc/x",
    "http://[::1]:8080/p?b=1",
    "http://[2001:db8::7]/c",
    "https://u@[::1]:443/q",
    "",
]


def test_canonicalize_batch_matches_scalar():
    out = canonicalize_batch(pd.Series(URL_CASES))
    for url, canon, host in zip(URL_CASES, out["url_canon"], out["host"]):
        assert canon == canonicalize_one(url), url
        assert host == extract_host(url), url


def test_canonicalize_semantics():
    out = canonicalize_batch(pd.Series(URL_CASES))["url_canon"].tolist()
    assert out[0] == "https://example.com/a/c?a=1&b=2"  # port+dots+sort+tracking+frag
    assert out[1] == "http://host.org/"
    assert out[2] == "http://host.org:8080/x"  # non-default port kept, ref dropped
    assert out[4] == "https://acl.org/"  # empty path → /
    assert out[7] == "https://h.com/a?a=2&z=1"


@given(
    st.lists(
        st.from_regex(r"https?://[a-z]{1,8}\.[a-z]{2,3}(:\d{1,4})?(/[a-zA-Z0-9._~-]{0,10}){0,4}(\?[a-z]{1,5}=[a-z0-9]{0,6}(&[a-z]{1,5}=[a-z0-9]{0,6}){0,3})?(#[a-z]{0,5})?", fullmatch=True),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=30, deadline=None)
def test_canonicalize_property(urls):
    out = canonicalize_batch(pd.Series(urls))
    for url, canon in zip(urls, out["url_canon"]):
        assert canon == canonicalize_one(url)
        # idempotence: canonicalizing a canonical URL is a no-op
        assert canonicalize_one(canon) == canon


def test_spark_canonicalize_udf(spark):
    from pubcrawler_spark.functions.urltools import with_canonical_url

    df = spark.createDataFrame([(u,) for u in URL_CASES if u], "url string")
    rows = with_canonical_url(df).collect()
    for r in rows:
        assert r.url_canon == canonicalize_one(r.url)
        assert r.host == extract_host(r.url)
        assert r.url_hash == murmur3_64(r.url_canon.encode())


def test_murmur3_ascii_kgram_fast_path_parity():
    """r8 fast path: the vectorized ASCII k-gram hasher must produce the
    exact hash SET murmur3_64_batch produces over the distinct grams,
    for every k in the supported 1..8 range, including edge lengths."""
    import numpy as np

    from pubcrawler_spark.functions.hashing import (
        murmur3_64_ascii_kgrams,
        murmur3_64_batch,
    )

    rng = np.random.default_rng(11)
    cases = ["", "a", "ab", "abcde", "aaaaaaa", "the quick brown fox! 123"]
    cases += [
        "".join(chr(int(c)) for c in rng.integers(32, 127, int(n)))
        for n in rng.integers(1, 300, 10)
    ]
    for txt in cases:
        buf = np.frombuffer(txt.encode("ascii"), dtype=np.uint8)
        for k in (1, 2, 5, 8):
            grams = sorted({txt[i : i + k] for i in range(max(0, len(txt) - k + 1))})
            want = sorted(murmur3_64_batch(grams).tolist()) if grams else []
            got = sorted(murmur3_64_ascii_kgrams(buf, k).tolist())
            assert got == want, (txt[:20], k)


def test_minhash_signatures_unicode_fallback(spark):
    """Non-ASCII docs take the generic gram path; signatures must match
    the direct per-gram construction either way."""
    import numpy as np

    from pubcrawler_spark.functions.hashing import murmur3_64_batch
    from pubcrawler_spark.operators.dedup import _minhash_matrix, minhash_signatures

    rows = [(0, "résumé café naïve über"), (1, "plain ascii text here"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: list(r["sig"]) for r in minhash_signatures(df, "doc_id", "text", k=5).collect()}
    import re

    for doc, text in rows:
        t = re.sub(r"\s+", " ", text).strip().lower()
        grams = list({t[i : i + 5] for i in range(max(0, len(t) - 4))})
        h = [murmur3_64_batch(grams) if grams else np.empty(0, np.int64)]
        want = _minhash_matrix(h, 64).astype(np.int64)[0].tolist()
        assert got[doc] == want, doc
