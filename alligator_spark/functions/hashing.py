"""Deterministic hashing kernels: MinHash, SimHash, rolling fingerprints.

All hashes are seeded/deterministic (zlib.crc32 base hash + fixed affine
permutations mod a Mersenne prime) so block keys, dedup buckets and
checkpoint ids are stable across runs and cluster sizes — the same role
SHA-256 cache keys play in the reference (``alligator/fetchers.py:16-30``).

These run inside Arrow-vectorized pandas UDFs; numpy does the per-batch
work.
"""

from __future__ import annotations

import zlib

import numpy as np

MERSENNE = (1 << 61) - 1
_MAXH = np.uint64(1 << 62)


def _rng_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """crc32 of each char n-gram (whole string, space-padded tokens kept)."""
    if len(text) < n:
        grams = [text] if text else []
    else:
        grams = [text[i : i + n] for i in range(len(text) - n + 1)]
    if not grams:
        return np.zeros(1, dtype=np.uint64)
    return np.array([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64)


def minhash_signature(
    text: str, num_hashes: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature over 3-gram shingles; affine perms mod 2^61-1."""
    sh = shingle_hashes(text)
    # (a * h + b) mod p for every (perm, shingle) pair -> min over shingles
    vals = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(MERSENNE)
    return vals.min(axis=1)


def minhash_sig_arrays(texts, num_hashes: int = 16, seed: int = 7) -> list:
    """Per text: the raw MinHash signature as a list of ints (fits int64;
    values are mod 2^61-1). Computed ONCE per corpus — band keys for any
    banding are then derived JVM-side (xxhash64 over signature slices), so
    a looser second banding (the fuzzy retry) costs no second Python pass."""
    a, b = _rng_params(num_hashes, seed)
    return [
        [int(v) for v in minhash_signature(t or "", num_hashes, a, b)] for t in texts
    ]


def minhash_band_keys(
    texts, num_hashes: int = 16, bands: int = 4, seed: int = 7
) -> list[list[str]]:
    """Per text: one hex key per band (bands * rows == num_hashes).

    Docs sharing any band key are co-blocked; with rows r = num_hashes/bands
    the collision probability for Jaccard j is 1-(1-j^r)^bands.
    """
    a, b = _rng_params(num_hashes, seed)
    rows = num_hashes // bands
    out = []
    for t in texts:
        sig = minhash_signature(t or "", num_hashes, a, b)
        keys = []
        for bi in range(bands):
            chunk = sig[bi * rows : (bi + 1) * rows]
            h = zlib.crc32(chunk.tobytes()) & 0xFFFFFFFF
            keys.append(f"mh{bi}:{h:08x}")
        out.append(keys)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over 3-gram shingles (crc32-seeded splitmix64 bits)."""
    sh = shingle_hashes(text)
    # expand 32-bit crc to 64 bits deterministically (splitmix64 finalizer)
    x = sh.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    sim = (votes >= 0).astype(np.uint64)
    return int((sim << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")


def winnow_fingerprints(text: str, k: int = 8, window: int = 8) -> list[str]:
    """TRUE winnowing (Schleimer et al., SIGMOD'03): md5-hex every char
    k-gram, slide a window of ``window`` consecutive gram hashes, keep each
    window's minimum, dedupe + sort. Guarantees a match for any shared
    substring of length >= k + window - 1. md5-hex keys make the kernel
    reproducible in any engine (DuckDB ``md5``/``list_min`` compute the
    identical fingerprint — the exactness oracle relies on it)."""
    import hashlib

    def h(s: str) -> str:
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    text = text or ""
    if len(text) < k:
        return [h(text)]
    hs = [h(text[i : i + k]) for i in range(len(text) - k + 1)]
    if len(hs) <= window:
        return [min(hs)]
    return sorted({min(hs[j : j + window]) for j in range(len(hs) - window + 1)})
