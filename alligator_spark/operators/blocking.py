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

Token keys are pure built-in expressions; MinHash runs in one Arrow
pandas UDF producing all band keys per doc (then explodes).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alligator_spark.functions.hashing import minhash_band_keys
from alligator_spark.functions.textnorm import token_sort_key_col


@dataclass(frozen=True)
class BlockingConfig:
    prefix_tokens: int = 2
    minhash_hashes: int = 16
    minhash_bands: int = 8  # rows = hashes // bands = 2
    minhash_seed: int = 7


def block_keys(normalized: DataFrame, cfg: BlockingConfig | None = None) -> DataFrame:
    """(doc_id, norm_mention, ...) -> (doc_id, block_key, key_kind)."""
    cfg = cfg or BlockingConfig()
    base = normalized.select("doc_id", "norm_mention")

    tok_full = base.select(
        "doc_id",
        F.concat(F.lit("ts:"), token_sort_key_col(F.col("norm_mention"))).alias(
            "block_key"
        ),
        F.lit("token_sort").alias("key_kind"),
    )
    tok_prefix = base.select(
        "doc_id",
        F.concat(
            F.lit("tp:"),
            token_sort_key_col(F.col("norm_mention"), cfg.prefix_tokens),
        ).alias("block_key"),
        F.lit("token_prefix").alias("key_kind"),
    )

    nh, nb, seed = cfg.minhash_hashes, cfg.minhash_bands, cfg.minhash_seed

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def mh_keys(s: pd.Series) -> pd.Series:
        return pd.Series(minhash_band_keys(s.tolist(), nh, nb, seed))

    mh = base.select(
        "doc_id",
        F.explode(mh_keys(F.col("norm_mention"))).alias("block_key"),
        F.lit("minhash_band").alias("key_kind"),
    )

    tok_each = base.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("norm_mention", " "))).alias("tok"),
        F.lit("token").alias("key_kind"),
    ).select(
        "doc_id", F.concat(F.lit("tk:"), F.col("tok")).alias("block_key"), "key_kind"
    )

    return tok_full.unionByName(tok_prefix).unionByName(mh).unionByName(tok_each)
