"""The Alligator string/number/date similarity battery, vectorized.

Scalar semantics are pinned one-to-one to the reference implementation
(``alligator/utils.py:44-190``); the execution shape is different: these
kernels run over numpy/pandas batches inside Arrow-vectorized pandas UDFs
(never row-at-a-time Python UDFs).

Reference semantics reproduced here:

* ``get_ngrams(text, n)``      — alligator/utils.py:119-132 (per-token char
  n-grams, union over tokens; n=None -> whole token; token shorter than n
  contributes nothing)
* ``ngram_overlap``            — alligator/utils.py:135-140
  ``|A∩B| / max(|A|,|B|,1)``
* ``token_overlap``            — alligator/utils.py:143-150
* ``levenshtein_norm``         — alligator/utils.py:153-158
  (``edit_distance / max(len1,len2,1)``; we return the distance, the
  similarity used in features is ``1 - levenshtein_norm``)
* ``number_similarity``        — alligator/utils.py:161-174
  ``1 - |a-b| / max(|a|,|b|,1)``, 0.0 on parse failure
* ``parse_date`` fallbacks     — alligator/utils.py:78-111 (int -> Y-01-01,
  dateutil parse, strip-first-char retry, year-only retry)
* ``date_similarity``          — alligator/utils.py:177-190 (mean of
  number-similarity over year, month, day; 0.0 on failure)

``jaro_winkler`` is an addition called for by the build spec (not in the
reference); standard Winkler variant with p=0.1, max prefix 4.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from dateutil.parser import parse as _dateutil_parse


# ---------------------------------------------------------------- n-grams

def get_ngrams(text: str, n: int | None = 3) -> set:
    """Union of per-token character n-grams (n=None -> whole tokens)."""
    out = set()
    for token in text.split(" "):
        k = len(token) if n is None else n
        for i in range(len(token) - k + 1):
            out.add(token[i : i + k])
    return out


def ngram_overlap(s1: str, s2: str, n: int | None = None) -> float:
    a = get_ngrams(s1, n)
    b = get_ngrams(s2, n)
    return len(a & b) / max(len(a), len(b), 1)


def token_overlap(s1: str, s2: str) -> float:
    a = set(s1.split(" "))
    b = set(s2.split(" "))
    return len(a & b) / max(len(a), len(b), 1)


# ------------------------------------------- fast n-gram hash arrays
#
# The set-based get_ngrams/ngram_overlap above pin the REFERENCE semantics
# (and serve tests/small inputs). The kernel hot path uses uint32-hash
# numpy arrays instead: identical overlap values (modulo ~2^-32 collision
# probability) with no per-gram PyObject allocation — Python set churn
# saturates the memory subsystem past ~8 concurrent workers.


def ngram_hash_array(text: str, n: int | None = 3) -> np.ndarray:
    """Sorted unique uint32 hashes of get_ngrams(text, n).

    n=3 fast path: vectorized byte-window hashing for ASCII strings
    (windows containing the space separator are excluded == per-token
    trigrams). Non-ASCII or n!=3 falls back to hashing the exact
    reference gram set.
    """
    if n == 3:
        # pack 3 codepoints into 63 bits (21 bits each, exact — collision
        # free); ascii strings take the vectorized byte-window route, any
        # other string the per-gram loop; both land in the same hash space
        if text.isascii():
            bs = text.encode()
            if len(bs) < 3:
                return np.zeros(0, dtype=np.uint64)
            arr = np.frombuffer(bs, dtype=np.uint8).astype(np.uint64)
            h = (arr[:-2] << np.uint64(42)) | (arr[1:-1] << np.uint64(21)) | arr[2:]
            space = arr == 32
            mask = ~(space[:-2] | space[1:-1] | space[2:])
            return np.unique(h[mask])
        grams = get_ngrams(text, 3)
        if not grams:
            return np.zeros(0, dtype=np.uint64)
        return np.unique(
            np.fromiter(
                (
                    (ord(g[0]) << 42) | (ord(g[1]) << 21) | ord(g[2])
                    for g in grams
                ),
                dtype=np.uint64,
                count=len(grams),
            )
        )
    import zlib

    grams = get_ngrams(text, n)
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.fromiter(
            (zlib.crc32(g.encode()) for g in grams), dtype=np.uint64, count=len(grams)
        )
    )


def token_hash_array(text: str) -> np.ndarray:
    """Sorted unique uint32 crc32 hashes of the whitespace tokens."""
    import zlib

    toks = {t for t in text.split(" ")}
    return np.unique(
        np.fromiter(
            (zlib.crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks)
        )
    )


# ------------------------------------------------------------ levenshtein

def _levenshtein_dp(s1: str, s2: str) -> int:
    """Fallback O(len1) numpy-pass DP (used for strings > 64 chars)."""
    l2 = len(s2)
    arr2 = np.array(list(s2))
    prev = np.arange(l2 + 1)
    ar = np.arange(l2 + 1)
    for i, ch in enumerate(s1, 1):
        cur = np.concatenate(
            ([i], np.minimum(prev[:-1] + (arr2 != ch), prev[1:] + 1))
        )
        cur = np.minimum.accumulate(cur - ar) + ar
        prev = cur
    return int(prev[-1])


@lru_cache(maxsize=1 << 16)
def levenshtein(s1: str, s2: str) -> int:
    """Plain Levenshtein distance (insert/delete/substitute cost 1).

    Myers' bit-parallel algorithm (O(len2) word operations) for patterns
    up to 64 chars; numpy DP fallback beyond.
    """
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    m = len(s1)
    if m > 64:
        return _levenshtein_dp(s1, s2)
    peq: dict[str, int] = {}
    for i, c in enumerate(s1):
        peq[c] = peq.get(c, 0) | (1 << i)
    mask = (1 << m) - 1
    last = 1 << (m - 1)
    pv = mask
    mv = 0
    score = m
    for c in s2:
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & last:
            score += 1
        if mh & last:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


@lru_cache(maxsize=1 << 16)
def levenshtein_norm(s1: str, s2: str) -> float:
    return levenshtein(s1, s2) / max(len(s1), len(s2), 1)


# ------------------------------------------------------------ jaro-winkler

@lru_cache(maxsize=1 << 16)
def jaro_winkler(s1: str, s2: str, p: float = 0.1) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * l1
    flags2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * p * (1.0 - jaro)


# --------------------------------------------------------- numbers / dates

@lru_cache(maxsize=1 << 16)
def number_similarity(v1, v2) -> float:
    try:
        a = float(v1)
        b = float(v2)
        return 1.0 - abs(a - b) / max(abs(a), abs(b), 1)
    except Exception:
        return 0.0


@lru_cache(maxsize=1 << 16)
def parse_date(str_date):
    """Multi-fallback date parse (reference alligator/utils.py:78-111)."""
    try:
        int(str_date)
        str_date = f"{str_date}-01-01"
    except Exception:
        pass
    try:
        return _dateutil_parse(str_date)
    except Exception:
        pass
    try:
        d = _dateutil_parse(str_date[1:])
        return d
    except Exception:
        pass
    try:
        year = str_date[1:].split("-")[0]
        return _dateutil_parse(f"{year}-01-01")
    except Exception:
        return None


@lru_cache(maxsize=1 << 16)
def date_similarity(d1, d2) -> float:
    try:
        a = parse_date(d1)
        b = parse_date(d2)
        return (
            number_similarity(a.year, b.year)
            + number_similarity(a.month, b.month)
            + number_similarity(a.day, b.day)
        ) / 3.0
    except Exception:
        return 0.0
