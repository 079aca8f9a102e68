"""Stage 5 — transitive clustering: large-star/small-star connected
components over the accepted-edge DataFrame.

The reference never clusters explicitly (cells linking to the same QID are
implicitly co-referent — SURVEY §2.11); the north rule makes the closure
explicit. Algorithm: alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14), expressed as
hash joins + partial aggregations — no collect_list, so a giant star
(hot component) never materializes one row per component:

  large-star: bidirectional edges; for each u, m = min(N(u) ∪ {u});
              emit (v, m) for v in N(u) with v > u.
  small-star: orient edges (big -> small); for each u, m = min(N(u));
              emit (v, m) for v in N(u), plus (u, m).

Converges in O(log^2 n) rounds; our clusters are near-cliques so it
typically converges in 2-3. Driver-side iteration is the one thing
Catalyst cannot express (SURVEY §4), so the loop is engineered for
minimum serial driver cost: rounds are fused in PAIRS into a single
Spark job — a lazy localCheckpoint marks the round-2k output, and the
convergence fingerprint aggregation is the action that materializes it
(one job computes two star rounds, persists the result, truncates the
logical plan, and returns the fingerprint). The old shape (eager
checkpoint + separate fingerprint collect, every round) paid 2 driver
jobs per round; this pays 1 per 2 rounds, which matters because CC's
driver loop is pure serial time under the north rule's N->4N scaling
gate (Amdahl: fixed cost F does not shrink with executors).

Convergence check across a 2-round stride is sound: large-star /
small-star strictly decrease a potential function unless at the fixed
point (Kiveris et al. Thm 1-2), so edge-set equality two rounds apart
can only happen AT the fixed point — oscillation is impossible.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Both star joins pin shuffle_hash on the per-node min table: `mins` has
# one row per DISTINCT NODE — corpus-scaled — and sits above a truncated
# localCheckpoint whose size estimates are fiction, so the planner chose
# broadcast (r4 audit: 4 BroadcastHashJoin per fused double-round). A
# broadcast build is a serial driver collect that grows with the corpus
# and repeats EVERY round — at 10^12 nodes each round would ship the
# whole node table through the driver. Both join sides are already
# hash-partitioned on `u` by the groupBy, so the pinned shuffle join
# reuses those exchanges.


def _large_star(edges: DataFrame) -> DataFrame:
    bidir = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = bidir.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.withColumn("m", F.least("u", "mv")).select("u", "m")
    return (
        bidir.join(mins.hint("shuffle_hash"), "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    attach = (
        oriented.join(mins.hint("shuffle_hash"), "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    root = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return attach.unionAll(root).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # bit_xor: order-insensitive, overflow-free (ANSI-safe) set digest
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    all_nodes: DataFrame | None = None,
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """edges(doc_a, doc_b) -> components(doc_id, component_id).

    ``all_nodes`` (one ``doc_id`` column) adds singleton components for
    docs with no accepted edge. ``stats`` (optional) records driver-loop
    telemetry: rounds run, Spark jobs issued, per-job seconds.
    """
    # lazy checkpoint: the first fingerprint job below materializes the
    # initial distinct edge set, rounds 1-2 on top of it, and the round-2
    # checkpoint — all in ONE job — then truncates lineage.
    cur = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_fp = None
    rounds = jobs = 0
    while rounds < max_iter:
        cur = _small_star(_large_star(cur))
        rounds += 1
        if rounds % 2 == 0 or rounds == max_iter:
            # one action per 2 rounds: materialize + truncate + fingerprint
            cur = cur.localCheckpoint(eager=False)
            t0 = time.monotonic()
            fp = _fingerprint(cur)
            jobs += 1
            if stats is not None:
                stats.setdefault("job_secs", []).append(
                    round(time.monotonic() - t0, 3)
                )
            if fp == prev_fp:
                break
            prev_fp = fp
    if stats is not None:
        stats["rounds"] = rounds
        stats["jobs"] = jobs
    # after convergence every edge points child -> root
    comps = cur.select(
        F.col("src").alias("doc_id"), F.col("dst").alias("component_id")
    ).unionAll(
        cur.select(F.col("dst").alias("doc_id"), F.col("dst").alias("component_id"))
    ).groupBy("doc_id").agg(F.min("component_id").alias("component_id"))
    if all_nodes is not None:
        comps = (
            all_nodes.select("doc_id")
            .join(comps, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("component_id", "doc_id").alias("component_id"),
            )
        )
    return comps
