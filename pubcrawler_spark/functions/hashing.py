"""Vendored MurmurHash3 x64_128 (public domain algorithm, Austin Appleby).

The north rule mandates murmur3 URL hashing and vectorized (Arrow) UDFs
with no per-row Python. ``mmh3`` is not installed in this environment, so
we vendor two implementations:

- :func:`murmur3_x64_128` — scalar pure-Python, the readable spec; used
  by the single-process reference mirror and as the test oracle.
- :func:`murmur3_64_batch` — numpy-vectorized over a batch of strings
  (the whole batch advances 16-byte blocks in lockstep with a row mask),
  used inside the canonicalize+hash pandas UDF. Returns the low 64 bits
  of the 128-bit hash as signed int64 (Spark LongType).

Zero-padding trick: the murmur3 tail ORs only ``len & 15`` bytes into
k1/k2; padding with zero bytes and computing the tail unconditionally is
identity-preserving because ``x | 0 == x``, ``0 * c == 0`` and
``h ^= 0`` is a no-op. This removes all per-row branching.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Scalar MurmurHash3 x64_128. Returns (h1, h2) as unsigned ints."""
    length = len(data)
    nblocks = length // 16
    h1 = h2 = seed & _M64

    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64

    tail = data[nblocks * 16 :]
    padded = tail + b"\x00" * (16 - len(tail))
    rem = length & 15
    if rem > 8:
        k2 = int.from_bytes(padded[8:16], "little")
        k2 = (k2 * _C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if rem > 0:
        k1 = int.from_bytes(padded[0:8], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def murmur3_64(data: bytes, seed: int = 0) -> int:
    """Low 64 bits of x64_128, as signed int64 (matches Spark LongType)."""
    h1, _ = murmur3_x64_128(data, seed)
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1


# ---------------------------------------------------------------------------
# numpy-vectorized batch variant
# ---------------------------------------------------------------------------

_U = np.uint64
_NC1 = _U(_C1)
_NC2 = _U(_C2)


def _nrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _nfmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U(33))
    k = k * _U(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U(33))
    k = k * _U(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> _U(33))
    return k


def murmur3_64_batch(values, seed: int = 0) -> np.ndarray:
    """MurmurHash3 x64_128 low-64 over a batch of str/bytes.

    ``values``: iterable of str (utf-8 encoded) or bytes. Returns an
    int64 numpy array. The whole batch is processed in lockstep numpy
    passes — O(max_len/16) vector ops per batch, no per-row Python in
    the block loop.
    """
    bufs = [v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in values]
    n = len(bufs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lengths = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    max_len = int(lengths.max())
    # pad so every row has a full 16-byte tail slot beyond its blocks
    padded_len = (max_len // 16 + 1) * 16
    mat = np.zeros((n, padded_len), dtype=np.uint8)
    for i, b in enumerate(bufs):  # one memcpy per row; hashing itself is vector
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    words = mat.view("<u8")  # (n, padded_len // 8), little-endian lanes

    nblocks = (lengths // 16).astype(np.uint64)
    h1 = np.full(n, _U(seed), dtype=np.uint64)
    h2 = np.full(n, _U(seed), dtype=np.uint64)

    max_blocks = int(nblocks.max())
    for j in range(max_blocks):
        active = nblocks > _U(j)
        k1 = words[:, 2 * j].copy()
        k2 = words[:, 2 * j + 1].copy()
        k1 = _nrotl(k1 * _NC1, 31) * _NC2
        nh1 = h1 ^ k1
        nh1 = _nrotl(nh1, 27) + h2
        nh1 = nh1 * _U(5) + _U(0x52DCE729)
        k2 = _nrotl(k2 * _NC2, 33) * _NC1
        nh2 = h2 ^ k2
        nh2 = _nrotl(nh2, 31) + nh1
        nh2 = nh2 * _U(5) + _U(0x38495AB5)
        h1 = np.where(active, nh1, h1)
        h2 = np.where(active, nh2, h2)

    # tail: per-row word offset (gather); zero padding makes it branch-free
    rows = np.arange(n)
    t1 = words[rows, 2 * nblocks.astype(np.int64)]
    t2 = words[rows, 2 * nblocks.astype(np.int64) + 1]
    rem = lengths & 15
    k2 = _nrotl(t2 * _NC2, 33) * _NC1
    h2 = np.where(rem > 8, h2 ^ k2, h2)
    k1 = _nrotl(t1 * _NC1, 31) * _NC2
    h1 = np.where(rem > 0, h1 ^ k1, h1)

    ulen = lengths.astype(np.uint64)
    h1 ^= ulen
    h2 ^= ulen
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _nfmix(h1)
    h2 = _nfmix(h2)
    h1 = h1 + h2
    return h1.astype(np.int64)


def murmur3_64_ascii_kgrams(codes_u8: np.ndarray, k: int) -> np.ndarray:
    """Low-64 murmur3 of every DISTINCT k-byte substring of an ASCII
    byte sequence — the char-shingle hashing hot path with zero
    per-gram Python.

    ``murmur3_64_batch`` is vectorized over the hash *blocks* but still
    pays one Python-loop memcpy per input string; at minhash scale the
    inputs are ~10⁶ five-byte grams per batch and that loop dominates
    (measured 1.4 s for 1M grams at sf0.1). For grams of ``k ≤ 8``
    bytes the murmur3 x64_128 tail consumes exactly
    ``int.from_bytes(gram.ljust(8, b'\\0'), 'little')`` — i.e. the
    little-endian packed gram integer — so the whole pipeline
    (sliding-window extraction → packing → dedup → tail → finalizer)
    runs as numpy vector ops. Value-identical to
    ``murmur3_64_batch(distinct grams)`` (pinned by
    tests/test_hashing_url.py); caller guarantees ASCII (codepoints
    < 128) and ``k ≤ 8``.
    """
    if not 1 <= k <= 8:
        raise ValueError(f"fast path requires 1 <= k <= 8, got {k}")
    if len(codes_u8) < k:
        return np.empty(0, dtype=np.int64)
    wins = np.lib.stride_tricks.sliding_window_view(codes_u8, k)
    packed = np.zeros(wins.shape[0], dtype=np.uint64)
    for j in range(k):  # k vector ops, not per-gram work
        packed |= wins[:, j].astype(np.uint64) << _U(8 * j)
    uniq = np.unique(packed)  # distinct grams (order-irrelevant: minhash takes a min)
    # murmur3 x64_128 with length k: zero blocks, tail rem = k <= 8 →
    # only the k1 branch fires and k1 IS the packed integer
    h1 = _nrotl(uniq * _NC1, 31) * _NC2  # h1 = seed(0) ^ k1-mixed
    h2 = np.zeros_like(uniq)
    uk = _U(k)
    h1 = h1 ^ uk
    h2 = h2 ^ uk
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _nfmix(h1)
    h2 = _nfmix(h2)
    h1 = h1 + h2
    return h1.astype(np.int64)
