"""Ranking metrics: rank, filtered rank, MRR / Hits@K (SURVEY §2.7
R10-R12).

Reference parity: /root/reference/knovex/utils/metric.py:69-123 —
double-argsort entity rankings (76-78), the filtered protocol that
subtracts better-ranked easy and better-ranked hard answers (96-109),
and per-query-type MRR / Hits@1/3/10 (111-123).

Scale design (SURVEY §7 hard parts): ranks are computed ONLY for answer
entities via count-of-better — a join + conditional sum that is
O(answers × entities) work with map-side partial aggregation — never an
argsort (or window sort) over the full entity set per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def answer_ranks(
    scores: DataFrame, answers: DataFrame, ties: str = "best"
) -> DataFrame:
    """0-based rank of each answer entity within its query's score list.

    scores:  (query_id, t, score)  dense per query
    answers: (query_id, t)
    returns: (query_id, t, rank)

    Tie handling — a DOCUMENTED divergence from the reference: its
    double-argsort (metric.py:76-78) gives tied entities distinct,
    permutation-dependent ranks; that order is an artifact of the sort,
    not a semantic.  Modes:

    - "best" (default): rank = #entities with strictly better score;
      tied entities share the best position (deterministic, integer).
    - "average": rank = #better + (#ties - 1)/2 — the expected rank of
      a tied entity under a random tie permutation, closest to the
      reference's average behavior over seeds (DOUBLE column).

    With heavily tied scores (e.g. the 0/1 FactOracle) downstream
    MRR/Hits differ from any single reference run under either mode;
    "average" matches the reference in expectation.
    """
    if ties not in ("best", "average"):
        raise ValueError(f"unknown tie mode {ties!r}")
    own = answers.join(scores, ["query_id", "t"]).select(
        "query_id", F.col("t").alias("a_t"), F.col("score").alias("a_score")
    )
    grouped = (
        own.join(scores, "query_id")
        .groupBy("query_id", "a_t", "a_score")
        .agg(
            F.sum(F.when(F.col("score") > F.col("a_score"), 1).otherwise(0)).alias(
                "n_better"
            ),
            F.sum(F.when(F.col("score") == F.col("a_score"), 1).otherwise(0)).alias(
                "n_tied"  # includes the answer itself
            ),
        )
    )
    if ties == "best":
        rank = F.col("n_better").cast("long")
    else:
        rank = F.col("n_better") + (F.col("n_tied") - 1) / 2.0
    return grouped.select(
        "query_id", F.col("a_t").alias("t"), rank.alias("rank")
    )


def filtered_hard_ranks(
    scores: DataFrame, easy: DataFrame, hard: DataFrame
) -> DataFrame:
    """R11 filtered protocol (metric.py:96-109): from each hard answer's
    rank subtract (a) the number of easy answers ranked strictly better
    and (b) the number of OTHER hard answers ranked strictly better.

    easy/hard: (query_id, t). Returns (query_id, t, rank) adjusted.
    """
    hard_r = answer_ranks(scores, hard)
    easy_r = answer_ranks(scores, easy).select(
        "query_id", F.col("rank").alias("e_rank")
    )

    better_easy = (
        hard_r.join(easy_r, "query_id", "left")
        .groupBy("query_id", "t", "rank")
        .agg(
            F.sum(
                F.when(F.col("e_rank") < F.col("rank"), 1).otherwise(0)
            ).alias("n_better_easy")
        )
    )
    other_hard = hard_r.select("query_id", F.col("rank").alias("h_rank"))
    better_hard = (
        better_easy.join(other_hard, "query_id")
        .groupBy("query_id", "t", "rank", "n_better_easy")
        .agg(
            F.sum(
                F.when(F.col("h_rank") < F.col("rank"), 1).otherwise(0)
            ).alias("n_better_hard")
        )
    )
    return better_hard.select(
        "query_id",
        "t",
        (
            F.col("rank")
            - F.coalesce(F.col("n_better_easy"), F.lit(0))
            - F.col("n_better_hard")
        ).alias("rank"),
    )


def mrr_hits(
    hard_ranks: DataFrame, query_types: DataFrame, ks: tuple[int, ...] = (1, 3, 10)
) -> DataFrame:
    """R12: per-query mean over hard answers, then mean per query type
    (the reference appends one value per query then averages,
    metric.py:111-123).

    query_types: (query_id, qtype). Returns one row per qtype with
    mrr / hit1 / hit3 / hit10.

    Tie caveat (see answer_ranks): under heavily tied scores these
    aggregates depend on the tie mode used upstream and will not match
    a single reference run bit-for-bit.  "best" is deterministic;
    "average" yields the EXPECTED RANK per answer, but aggregates are
    convex transforms of the rank, so MRR/Hits computed from averaged
    ranks are NOT the expectation of MRR/Hits over tie permutations
    (1/(1+E[r]) != E[1/(1+r)]) — treat them as a tie-stable summary,
    not an unbiased estimate (round-2 advisor finding).
    """
    per_query = hard_ranks.groupBy("query_id").agg(
        F.avg(1.0 / (1.0 + F.col("rank"))).alias("mrr"),
        *[
            F.avg((F.col("rank") < k).cast("double")).alias(f"hit{k}")
            for k in ks
        ],
    )
    return (
        per_query.join(query_types, "query_id")
        .groupBy("qtype")
        .agg(
            F.avg("mrr").alias("mrr"),
            *[F.avg(f"hit{k}").alias(f"hit{k}") for k in ks],
        )
    )
