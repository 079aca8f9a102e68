"""Stage 3 — candidate pair generation: salted self-join within blocks.

This is the engine's core join (SURVEY §2.3 J6). A block of size s yields
s*(s-1)/2 pairs, so hot keys explode quadratically — the reference's
skip/limit partitioning has no answer to this (``alligator/manager/
worker.py:141-177``, "no skew handling"); here skew is handled explicitly:

* blocks with a single doc are dropped (no pairs);
* blocks larger than ``max_block_size`` are *salt-split*: each doc is
  assigned ``crc32(doc_id) % g`` with ``g = ceil(size / max_block_size)``,
  and pairing happens within (block_key, salt). This caps per-task work at
  ~max_block_size^2; the recall cost (cross-salt pairs lost in that block)
  is recorded in lineage (split_blocks / oversize_docs counts).
* AQE skew-join handles residual imbalance at runtime.

Cross-key duplicate pairs are removed with one hash aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PairConfig:
    max_block_size: int = 64
    # hard cap: blocks bigger than this even after statistics are dropped
    # entirely (a degenerate key like the empty mention); logged in lineage
    drop_block_size: int = 100_000
    # partition sizing for the amplifying self-join: target EMITTED pairs
    # per task (the join's cost unit — input bytes are fiction here).
    # Partitions = clamp(est_pairs / this, parallelism, 4*parallelism):
    # small corpora get one wave of core-count tasks instead of a flat
    # 4x-slack fan-out (r3 shipped defaultParallelism*4 always — measured
    # ~3s of pure task overhead at 5k docs), big corpora keep the full
    # 4x skew slack. est_pairs comes from the block-stats aggregate the
    # lineage already needs, so sizing costs no extra corpus scan.
    target_pairs_per_task: int = 50_000
    # reference parity: candidate_retrieval_limit — each mention
    # retrieves at most this many candidates (alligator/config.py:157
    # defaults 16; the examples use 10-50). Without a cap candidate
    # volume grows with shared-vocabulary density, and the scoring
    # join's shuffle grows with it; the cap makes scoring cost
    # O(docs x limit) — linear in the corpus with a small constant
    # (the block-size caps above already bound the worst case at
    # ~n_keys x max_block_size per doc, but that constant is ~500).
    # A pair survives if EITHER endpoint ranks it (the reference's
    # retrieval is per-mention too).
    # Ranking: when MinHash signatures are passed in, by estimated
    # Jaccard (signature-position agreement) — the reference's index
    # returns top-K by fuzzy-match RELEVANCE (alligator/fetchers.py:
    # 90-113), so the cap must keep the most-similar candidates, not an
    # arbitrary subset; the block-size-then-id ordering used as the
    # no-signature fallback squeezed true typo'd duplicates below junk
    # size-2 band-collision pairs once the corpus grew past ~10^5 docs
    # (measured at 120k docs / 20k entities: limit 16 + block-size
    # order = 128 never-paired gold pairs; 16 + relevance = 48;
    # 32 + relevance = 6; uncapped = 0 at only 17 candidate edges/doc).
    # Default 32: token-truncated variants in ambiguous neighborhoods
    # (other entities legitimately containing the variant's whole name)
    # need the scorer's literal evidence to win, so the retrieval tier
    # must let them through. Ties break by smallest shared block, then
    # id. Exact-duplicate star edges are unioned downstream and are
    # never capped. None disables (volume then bounded by the block
    # caps alone).
    candidate_limit: int | None = 32


def exact_mention_pairs(normalized: DataFrame) -> DataFrame:
    """A1-style exact-duplicate star (reference distinct-mention dedup,
    alligator/processors.py:133-160): docs with an IDENTICAL normalized
    mention are each paired to their group's min doc_id. O(n) edges per
    group (heavy-hitter safe — a mention repeated 10^6 times yields a
    star, never a quadratic block), and the star spans the group, so
    transitive closure connects it whenever the scorer accepts the edges.

    This guarantees exact-duplicate recall INDEPENDENT of block-size
    caps: a salt-split of an oversized block partitions members by
    doc_id hash and can separate exact duplicates — these edges put them
    back. Returns (doc_a, doc_b, block_key='ex:<mention md5>')."""
    m = normalized.select("doc_id", "norm_mention")
    reps = m.groupBy("norm_mention").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n")
    )
    return (
        m.join(reps.filter(F.col("n") > 1), "norm_mention")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(
            F.least("doc_id", "rep").alias("doc_a"),
            F.greatest("doc_id", "rep").alias("doc_b"),
            F.concat(F.lit("ex:"), F.md5("norm_mention")).alias("block_key"),
        )
    )


def candidate_pairs(
    keys: DataFrame,
    cfg: PairConfig | None = None,
    sigs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """keys(doc_id, block_key, key_kind) -> (pairs, block_stats).

    pairs: (doc_a, doc_b, block_key)  with doc_a < doc_b, deduped.
    block_stats: per-block size/salt bookkeeping for lineage.
    sigs: optional (doc_id, sig) MinHash signatures (the pipeline's
    shared ``minhash_signatures`` pass) — when present, the per-endpoint
    candidate cap ranks by estimated Jaccard instead of block size (see
    ``PairConfig.candidate_limit``).
    """
    cfg = cfg or PairConfig()

    sizes = keys.groupBy("block_key").agg(F.count("*").alias("block_size"))
    sizes = sizes.withColumn(
        "n_salts",
        F.when(F.col("block_size") > cfg.drop_block_size, F.lit(-1))  # dropped
        .when(
            F.col("block_size") > cfg.max_block_size,
            F.ceil(F.col("block_size") / cfg.max_block_size).cast("int"),
        )
        .otherwise(F.lit(1)),
    )
    # materialize the (small: one row per distinct key) stats once — the
    # join below reuses it instead of re-aggregating keys, and the pair
    # estimate for partition sizing reads it for free
    sizes = sizes.localCheckpoint(eager=True)
    # expected pre-cap pair volume: each kept block of size s split into
    # n salts emits ~n * C(s/n, 2) ~ s^2/(2n) pairs
    est_row = sizes.filter(
        (F.col("n_salts") > 0) & (F.col("block_size") > 1)
    ).agg(
        F.sum(
            F.col("block_size") * F.col("block_size")
            / (F.lit(2.0) * F.col("n_salts"))
        ).alias("est_pairs")
    ).collect()[0]
    est_pairs = float(est_row["est_pairs"] or 0.0)

    keyed = (
        # shuffle-hash, never broadcast: sizes has one row per DISTINCT
        # block key — corpus-scaled. The plan audit showed the static
        # planner broadcasting it at 600k docs: size estimates below a
        # mapInPandas source are fiction, so the 8MB ceiling cannot be
        # trusted here and the strategy is pinned explicitly.
        keys.join(sizes.hint("shuffle_hash"), "block_key")
        .filter((F.col("block_size") > 1) & (F.col("n_salts") > 0))
        .withColumn(
            "salt",
            F.when(F.col("n_salts") == 1, F.lit(0)).otherwise(
                F.pmod(F.crc32(F.col("doc_id")), F.col("n_salts")).cast("int")
            ),
        )
        .select("block_key", "salt", "doc_id", "block_size")
    )
    if cfg.candidate_limit and sigs is not None:
        # Relevance for the candidate cap: carry each doc's MinHash
        # signature THROUGH the key rows (one per (doc, key) — ~7-9/doc)
        # so the self-join can compute signature agreement inline at
        # pair emission, JVM-side. This adds ~n_hashes longs to the
        # already-needed key exchange; the alternative — joining the
        # signature table onto the pre-cap pair table from both sides —
        # shuffles the AMPLIFIED (~30x docs) pair rows twice and was the
        # dominant serial cost of the stage at local[1] (round-5 1v4
        # decomposition).
        keyed = keyed.join(sigs.hint("shuffle_hash"), "doc_id").select(
            "block_key", "salt", "doc_id", "block_size", "sig"
        )
    # The self-join AMPLIFIES: a task reading s co-blocked rows emits
    # ~s^2/2 pairs, so task cost tracks sum(s^2) while AQE balances INPUT
    # bytes (and the compressed key shuffle is tiny — measured: the whole
    # 600k-doc pair build ran on ~2 effective cores). Explicit hash
    # repartitioning on the join key spreads the quadratic work; the join
    # reuses this partitioning for both sides (no extra exchange). The
    # partition count is sized by the ESTIMATED pair volume (see
    # PairConfig.target_pairs_per_task), floored at one wave of cores and
    # capped at 4x-parallelism skew slack.
    sc = keys.sparkSession.sparkContext
    dp = max(sc.defaultParallelism, 4)
    est_parts = int(est_pairs // cfg.target_pairs_per_task) + 1
    # volume-adaptive floor (r6): a tiny corpus (est_pairs ~ 10^3-10^4)
    # does not need a full wave of core-count tasks — per-task fixed cost
    # dominates and the flat `dp` floor was pure overhead (measured: the
    # 500-doc pair build spent more on 32-task scheduling than on pairs).
    # Medium/large corpora hit the dp..4*dp band exactly as before.
    n_parts = min(max(est_parts, 8), dp * 4)
    keyed = keyed.repartition(n_parts, "block_key", "salt")

    has_sim = bool(cfg.candidate_limit) and sigs is not None
    a = keyed.alias("a")
    # shuffle-hash for the self-join too (same fictional-estimate issue);
    # both sides reuse the explicit repartition above — no extra exchange
    b = keyed.alias("b").hint("shuffle_hash")
    emit = [
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("block_key"),
        F.col("a.block_size").alias("block_size"),
    ]
    if has_sim:
        # signature agreement computed AT EMISSION (whole-stage codegen:
        # 16 long compares per pair) — the pair table never re-shuffles
        # to pick up signatures
        emit.append(
            F.size(
                F.filter(
                    F.zip_with("a.sig", "b.sig", lambda x, y: x == y),
                    lambda v: v,
                )
            ).alias("_sim")
        )
    pairs = (
        a.join(b, on=["block_key", "salt"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(*emit)
    )
    # one (doc_a, doc_b) edge even when co-blocked under several keys;
    # keep the MOST SPECIFIC key (smallest block, then lexicographic) —
    # deterministic, and the size feeds the candidate-limit ranking.
    # _sim is a pure function of the two docs, identical on every copy.
    aggs = [F.min(F.struct("block_size", "block_key")).alias("_sel")]
    if has_sim:
        aggs.append(F.max("_sim").alias("_sim"))
    pairs = pairs.groupBy("doc_a", "doc_b").agg(*aggs).select(
        "doc_a",
        "doc_b",
        F.col("_sel.block_key").alias("block_key"),
        F.col("_sel.block_size").alias("block_size"),
        *([F.col("_sim")] if has_sim else [F.lit(0).alias("_sim")]),
    )
    if cfg.candidate_limit:
        # per-endpoint top-K over narrow rows — this window is what keeps
        # the WIDE scoring shuffle linear in docs. Relevance = estimated
        # Jaccard (signature agreement, computed in the self-join above);
        # falls back to block specificity when no signatures are supplied.
        sides = pairs.select(
            F.col("doc_a").alias("ep"), F.col("doc_b").alias("other"),
            "block_size", "_sim",
        ).unionAll(
            pairs.select(
                F.col("doc_b").alias("ep"), F.col("doc_a").alias("other"),
                "block_size", "_sim",
            )
        )
        w = Window.partitionBy("ep").orderBy(
            F.desc("_sim"), "block_size", "other"
        )
        keep = (
            sides.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= cfg.candidate_limit)
            .select(
                F.least("ep", "other").alias("doc_a"),
                F.greatest("ep", "other").alias("doc_b"),
            )
            .distinct()
        )
        pairs = pairs.join(keep, ["doc_a", "doc_b"], "left_semi")
    return pairs.drop("block_size", "_sim"), sizes
