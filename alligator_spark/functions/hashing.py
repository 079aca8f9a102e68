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


# ---------------------------------------------------------------------------
# Vectorized batch kernels (r6). Bit-identical to the scalar functions
# above — same crc32 base hash, same affine permutations with the same
# uint64 wraparound, same segment minima — but computed over a whole
# Arrow batch at once instead of one numpy round-trip per text. The
# scalar paths remain as the executable specification (equivalence is
# pinned by tests/test_similarity.py::TestBatchKernelEquivalence).

def _make_crc_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        t[i] = c
    return t


_CRC_T = _make_crc_table()


def _crc32_mat(mat: np.ndarray) -> np.ndarray:
    """crc32 of each ROW of a (n, L) uint8 matrix — table-driven, one
    vectorized step per byte column (L is small: 3 for shingles, 8*rows
    for band keys). Identical to zlib.crc32(row.tobytes())."""
    crc = np.full(mat.shape[0], 0xFFFFFFFF, dtype=np.uint32)
    for j in range(mat.shape[1]):
        crc = (crc >> np.uint32(8)) ^ _CRC_T[(crc ^ mat[:, j]) & np.uint32(0xFF)]
    return crc ^ np.uint32(0xFFFFFFFF)


def _batch_shingles(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenated shingle hashes for a batch of texts.

    Returns (hashes uint64, starts int64, lengths int64): hashes is the
    concatenation of every text's shingle_hashes(); starts[i] is text i's
    offset into it (every text contributes >= 1 entry, exactly like the
    scalar path: empty -> [0], short -> [crc32(text)]).

    ASCII texts (the overwhelming majority: md5 strings, normalized
    mentions) go through one vectorized sliding-window crc32; non-ASCII
    texts fall back to the scalar kernel — per text, same values."""
    counts = np.empty(len(texts), dtype=np.int64)
    parts: list[np.ndarray] = []
    # Vectorizable texts (ASCII, >= n chars) are joined into ONE buffer
    # with a '\x00' separator and windowed once — the old per-text
    # encode/frombuffer/window loop was itself the kernel's hot spot
    # (measured ~18 us/text, 60% of the pass on short-text corpora).
    fast_texts: list[str] = []
    fast_slots: list[int] = []
    for i, t in enumerate(texts):
        t = t or ""
        if len(t) < n:
            if t:
                h = np.array([zlib.crc32(t.encode("utf-8"))], dtype=np.uint64)
            else:
                h = np.zeros(1, dtype=np.uint64)
            counts[i] = len(h)
            parts.append(h)
            continue
        if not t.isascii():
            h = shingle_hashes(t, n)  # non-ASCII: scalar fallback
            counts[i] = len(h)
            parts.append(h)
            continue
        counts[i] = len(t) - n + 1
        fast_slots.append(len(parts))
        parts.append(None)  # type: ignore[arg-type]
        fast_texts.append(t)
    if fast_texts:
        blob = np.frombuffer("\x00".join(fast_texts).encode(), dtype=np.uint8)
        lens = np.fromiter(
            (len(t) for t in fast_texts), dtype=np.int64, count=len(fast_texts)
        )
        m = lens - n + 1
        # window start offsets per text inside the blob (texts separated
        # by exactly one byte) — windows never span the separator because
        # only in-text starts are indexed
        text_off = np.zeros(len(fast_texts), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=text_off[1:])
        seg_end = np.cumsum(m)
        intra = np.arange(int(seg_end[-1]), dtype=np.int64) - np.repeat(
            seg_end - m, m
        )
        win_start = np.repeat(text_off, m) + intra
        allwin = np.lib.stride_tricks.sliding_window_view(blob, n)[win_start]
        crcs = _crc32_mat(allwin).astype(np.uint64)
        for slot, s, e in zip(fast_slots, seg_end - m, seg_end):
            parts[slot] = crcs[s:e]
    hashes = np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint64)
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return hashes, starts, counts


# cap on the (shingles x num_hashes) working matrix per internal chunk
_BATCH_CELL_BUDGET = 16_000_000


def minhash_sigs_batch(texts, num_hashes: int = 16, seed: int = 7) -> np.ndarray:
    """(len(texts), num_hashes) uint64 MinHash signatures — the batch
    form of minhash_signature (same affine perms, same uint64 wraparound,
    same per-text minima)."""
    a, b = _rng_params(num_hashes, seed)
    hashes, starts, counts = _batch_shingles(texts)
    out = np.empty((len(texts), num_hashes), dtype=np.uint64)
    if not len(hashes):
        return out
    # Distinct-gram factoring (r6): a batch of texts shares its shingle
    # vocabulary heavily (3-gram space is tiny vs total shingle count),
    # so compute the permuted value (a*h+b) mod p — the slow uint64
    # modmul, same wraparound as the scalar spec — once per DISTINCT
    # shingle hash and per-permutation, then GATHER per occurrence and
    # segment-min. Gather + reduceat per permutation replaces the
    # (total_shingles x num_hashes) modmul matrix: bit-identical values
    # (the lut rows ARE (a*h+b)%p for the same uint64 h), ~10x less
    # arithmetic on repetitive corpora.
    uniq, inv = np.unique(hashes, return_inverse=True)
    for kk in range(num_hashes):
        lut = (a[kk] * uniq + b[kk]) % np.uint64(MERSENNE)
        out[:, kk] = np.minimum.reduceat(lut[inv], starts)
    return out


def minhash_sig_arrays(texts, num_hashes: int = 16, seed: int = 7) -> list:
    """Per text: the raw MinHash signature as a list of ints (fits int64;
    values are mod 2^61-1). Computed ONCE per corpus — band keys for any
    banding are then derived JVM-side (xxhash64 over signature slices), so
    a looser second banding (the fuzzy retry) costs no second Python pass."""
    sigs = minhash_sigs_batch(texts, num_hashes, seed)
    return [[int(v) for v in row] for row in sigs]


def minhash_band_keys(
    texts, num_hashes: int = 16, bands: int = 4, seed: int = 7
) -> list[list[str]]:
    """Per text: one hex key per band (bands * rows == num_hashes).

    Docs sharing any band key are co-blocked; with rows r = num_hashes/bands
    the collision probability for Jaccard j is 1-(1-j^r)^bands.
    """
    rows = num_hashes // bands
    sigs = minhash_sigs_batch(texts, num_hashes, seed)
    # bytes of each band slice == the scalar path's chunk.tobytes()
    # (both little-endian contiguous uint64), crc32'd vectorized
    sig_bytes = np.ascontiguousarray(sigs).view(np.uint8).reshape(
        len(texts), num_hashes * 8
    )
    band_hex = []
    for bi in range(bands):
        h = _crc32_mat(sig_bytes[:, bi * rows * 8 : (bi + 1) * rows * 8])
        band_hex.append(np.char.mod(f"mh{bi}:%08x", h))
    return [list(row) for row in zip(*band_hex)]


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


def simhash64_batch(texts) -> np.ndarray:
    """(len(texts),) int64 SimHashes — the batch form of simhash64 (same
    crc32 shingles, same splitmix64 expansion, same per-bit majority),
    with the uint64 result reinterpreted as int64 (two's-complement fold,
    exactly what _to_i64 in operators.dedup does to the scalar value)."""
    hashes, starts, counts = _batch_shingles(texts)
    x = hashes.copy()
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    out = np.empty(len(texts), dtype=np.uint64)
    i = 0
    max_shingles = max(_BATCH_CELL_BUDGET // 64, 1)
    while i < len(texts):
        j = i
        tot = 0
        while j < len(texts) and (tot + counts[j] <= max_shingles or j == i):
            tot += counts[j]
            j += 1
        seg = x[starts[i] : starts[i] + tot]
        # bit j of the uint64 == column j of the little-endian unpack —
        # one uint8 matrix instead of a 64-wide uint64 expansion
        bits = np.unpackbits(
            seg.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        cnt = np.add.reduceat(bits, starts[i:j] - starts[i], axis=0, dtype=np.int64)
        sim = (2 * cnt >= counts[i:j, None]).astype(np.uint8)
        out[i:j] = np.packbits(sim, axis=1, bitorder="little").view(np.uint64).ravel()
        i = j
    return out.view(np.int64)


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
