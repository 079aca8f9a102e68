"""Stage 2 — blocking: candidate generation keys.

The reference retrieves candidates per mention from an external fuzzy
string index (``alligator/fetchers.py:90-113``). With no external KB, the
Spark-native equivalent is key-based blocking: docs sharing a block key
become candidate pairs. Three key families, unioned:

* ``token_sort``    — full sorted-distinct-token key (exact-after-clean_str
  matches, token reorders)
* ``token_prefix``  — first 2 sorted tokens (tolerates token drop/append)
* ``minhash_band``  — LSH bands over 3-gram MinHash signatures (tolerates
  typos; the reference's fuzzy=True retry, ``alligator/processors.py:169-198``)
* ``token``         — one key per distinct mention token (the reference's
  Elasticsearch-style token retrieval); hot tokens are defused downstream
  by the pair stage's block-size caps + salting

Token keys are pure built-in expressions. MinHash signatures are computed
in ONE Arrow pandas UDF (minhash_signatures); every banding — strict block
bands and the loose fuzzy-retry bands — is derived from that signature
column with JVM-side xxhash64 slices, so re-banding never re-hashes text.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alligator_spark.functions.hashing import minhash_sig_arrays
from alligator_spark.functions.textnorm import token_sort_key_col


@dataclass(frozen=True)
class BlockingConfig:
    # rows = hashes // bands; 4x4 keeps random-pair band collisions at
    # ~(j_bg^4)*4 (negligible for background shingle-jaccard ~0.05) while
    # the per-token keys carry typo recall (a typo alters one token; the
    # others still match exactly). 8x2 at 50k docs produced 6.7M candidate
    # pairs from random band collisions -- quadratic death at corpus scale.
    minhash_hashes: int = 16
    minhash_bands: int = 4
    minhash_seed: int = 7
    # R4 fuzzy retry: docs that produced zero candidate pairs get a looser
    # second blocking pass (more bands, fewer rows -> higher recall)
    fuzzy_bands: int = 8
    fuzzy_enabled: bool = True
    # include the first-P-sorted-tokens key family (subsumed by per-token
    # keys; off by default, kept for corpora where hot tokens get dropped)
    prefix_tokens: int | None = None


def minhash_sig_udf(cfg: BlockingConfig | None = None):
    """The MinHash-signature column function (Arrow pandas UDF) for a
    given config. Exposed separately so the streaming path can add the
    signature as an inline column on a streaming frame (a stateless
    per-micro-batch projection — a join back to a separate signatures
    frame would be a stream-stream join)."""
    cfg = cfg or BlockingConfig()
    nh, seed = cfg.minhash_hashes, cfg.minhash_seed

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(s: pd.Series) -> pd.Series:
        return pd.Series(minhash_sig_arrays(s.tolist(), nh, seed))

    return sig


def minhash_signatures(
    normalized: DataFrame, cfg: BlockingConfig | None = None
) -> DataFrame:
    """(doc_id, norm_mention) -> (doc_id, sig array<long>): the per-doc
    MinHash signature, computed ONCE (one Arrow pass over the corpus).
    Both the strict banding (block_keys) and the loose fuzzy banding
    (fuzzy_rescue_pairs) re-band this column JVM-side — the reference's
    fuzzy=True retry re-queries the index, it does not recompute the
    text-side hashes (alligator/processors.py:169-198)."""
    sig = minhash_sig_udf(cfg)
    return normalized.select("doc_id", sig(F.col("norm_mention")).alias("sig"))


def band_key_cols(sig_col: str, num_hashes: int, bands: int, prefix: str) -> list:
    """JVM-side band keys from a signature array: per band, xxhash64 over
    that band's signature slice (whole-stage codegen, zero Python)."""
    rows = num_hashes // bands
    return [
        F.concat(
            F.lit(f"{prefix}{bi}:"),
            F.xxhash64(
                *[F.element_at(sig_col, bi * rows + j + 1) for j in range(rows)]
            ).cast("string"),
        )
        for bi in range(bands)
    ]


def block_keys(
    normalized: DataFrame,
    cfg: BlockingConfig | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, norm_mention, ...) -> (doc_id, block_key, key_kind).

    ``sigs`` (from minhash_signatures) is computed on demand when absent;
    pass it explicitly to share one signature pass with the fuzzy retry."""
    cfg = cfg or BlockingConfig()
    base = normalized.select("doc_id", "norm_mention")

    tok_full = base.select(
        "doc_id",
        F.concat(F.lit("ts:"), token_sort_key_col(F.col("norm_mention"))).alias(
            "block_key"
        ),
        F.lit("token_sort").alias("key_kind"),
    )
    parts = [tok_full]
    if cfg.prefix_tokens:
        parts.append(
            base.select(
                "doc_id",
                F.concat(
                    F.lit("tp:"),
                    token_sort_key_col(F.col("norm_mention"), cfg.prefix_tokens),
                ).alias("block_key"),
                F.lit("token_prefix").alias("key_kind"),
            )
        )

    if sigs is None:
        sigs = minhash_signatures(normalized, cfg)
    mh = sigs.select(
        "doc_id",
        F.explode(
            F.array(*band_key_cols("sig", cfg.minhash_hashes, cfg.minhash_bands, "mh"))
        ).alias("block_key"),
        F.lit("minhash_band").alias("key_kind"),
    )

    tok_each = base.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("norm_mention", " "))).alias("tok"),
        F.lit("token").alias("key_kind"),
    ).select(
        "doc_id", F.concat(F.lit("tk:"), F.col("tok")).alias("block_key"), "key_kind"
    )
    parts += [mh, tok_each]

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fuzzy_rescue_pairs(
    normalized: DataFrame,
    pairs: DataFrame,
    cfg: BlockingConfig | None = None,
    max_block_size: int = 256,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """R4 fuzzy retry (reference alligator/processors.py:169-198): docs
    that landed in NO candidate pair get a looser banding of the SAME
    MinHash signature (more bands, fewer rows -> higher recall) and are
    paired against any doc sharing a loose band. Pass ``sigs`` (from
    minhash_signatures) to reuse the signatures block_keys already
    computed — the re-banding is then pure JVM expressions, no second
    Python pass over the corpus.

    The lonely side is small by construction, so the band join is cheap;
    oversized loose buckets are dropped (they would pair a lonely doc
    with everything — no evidence value).
    Returns extra (doc_a, doc_b, block_key) rows, disjoint from `pairs`.
    """
    cfg = cfg or BlockingConfig()
    participating = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    lonely = normalized.select("doc_id").join(participating, "doc_id", "left_anti")

    if sigs is None:
        sigs = minhash_signatures(normalized, cfg)
    all_keys = sigs.select(
        "doc_id",
        F.explode(
            F.array(*band_key_cols("sig", cfg.minhash_hashes, cfg.fuzzy_bands, "fz:b"))
        ).alias("block_key"),
    )
    sizes = all_keys.groupBy("block_key").agg(F.count("*").alias("sz"))
    all_keys = all_keys.join(sizes, "block_key").filter(
        (F.col("sz") > 1) & (F.col("sz") <= max_block_size)
    )
    lonely_keys = all_keys.join(lonely.select("doc_id"), "doc_id", "left_semi")

    extra = (
        lonely_keys.select("block_key", F.col("doc_id").alias("l"))
        .join(all_keys.select("block_key", F.col("doc_id").alias("o")), "block_key")
        .filter(F.col("l") != F.col("o"))
        .select(
            F.least("l", "o").alias("doc_a"),
            F.greatest("l", "o").alias("doc_b"),
            "block_key",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.min("block_key").alias("block_key"))
    )
    return extra.join(pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti")
