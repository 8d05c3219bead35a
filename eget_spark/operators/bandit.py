"""UCB1 bandit scoring for crawl-budget allocation.

A recrawl scheduler faces the classic explore/exploit trade: hosts that
historically yielded new or changed pages deserve more fetches, but
rarely-probed hosts might be gold.  UCB1 (Auer, Cesa-Bianchi & Fischer,
Machine Learning 2002) resolves it with the optimism bonus

    ucb(h) = mean_reward(h) + sqrt(2 ln N / n_h)

where n_h is how often host h was pulled and N the total pulls; bandit
formulations of crawl scheduling are standard in the refresh literature
(the q243 Cho-Garcia-Molina policies are the fixed-rate special case —
UCB adapts when change rates must be LEARNED while crawling).

Pinned semantics (so the DuckDB oracle reproduces them exactly):
``mean_micro = (wins * 1e6) div pulls`` (exact truncating integer),
``bonus_micro = round(1e6 * sqrt(2 * ln(N) / pulls))``,
``ucb_micro = mean_micro + bonus_micro``; arms with 0 pulls are the
caller's concern (UCB1 initializes by pulling every arm once).  Output
ordered (ucb_micro desc, arm), limited to k.

Scale shape (100 TB): arm statistics are ONE map-side-combined groupBy
over the fetch ledger (hot hosts collapse per map task); the N scalar
rides a 1-row broadcast; scoring is a pure projection and the top-k a
TakeOrdered — no windows, no joins on the raw ledger, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ucb1_scores(
    pulls: DataFrame,
    arm_col: str = "host",
    reward_col: str = "reward",
    k: int = 20,
) -> DataFrame:
    """``pulls`` has one row per pull with a 0/1 (or fractional-integer)
    reward.  Returns (arm, pulls, wins, mean_micro, bonus_micro,
    ucb_micro) — the k arms UCB1 would schedule next."""
    arms = pulls.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count("*").cast("long").alias("pulls"),
        F.sum(reward_col).cast("long").alias("wins"),
    )
    tot = arms.agg(F.sum("pulls").cast("long").alias("n"))
    mean = F.expr("wins * CAST(1000000 AS BIGINT) DIV pulls")
    bonus = F.round(
        F.sqrt(
            2.0 * F.log(F.col("n").cast("double"))
            / F.col("pulls").cast("double")
        )
        * 1e6
    ).cast("long")
    return (
        arms.crossJoin(F.broadcast(tot))
        .select(
            "arm",
            "pulls",
            "wins",
            mean.alias("mean_micro"),
            bonus.alias("bonus_micro"),
            (mean + bonus).alias("ucb_micro"),
        )
        .orderBy(F.col("ucb_micro").desc(), "arm")
        .limit(k)
    )
