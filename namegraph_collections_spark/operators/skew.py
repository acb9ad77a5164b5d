"""Skew-mitigation operators (SURVEY §4 physical-execution notes).

AQE's skew-join split handles most hot keys at runtime; these
utilities cover the two cases it can't: aggregation state concentrated
on one key, and broadcast-infeasible joins against a skewed fact side.
Both are pure DataFrame rewrites — salt → partial → unsalt — and
produce results identical to their unsalted forms (asserted in
tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from namegraph_collections_spark.functions.det_round import round6_det

DEFAULT_SALTS = 16


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {sum, count, min, max}: every supported fn has a partial form, so
    phase 1 aggregates per (key, salt) — spreading one hot key over
    ``n_salts`` reducers — and phase 2 combines the partials per key.
    (avg = sum/count composed by the caller; non-decomposable aggs
    don't belong here.)
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("_salt")

    partial_exprs, final_exprs = [], []
    for out, (col, fn) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` concentrates rows on few key values
    and ``other`` is too large to broadcast.

    The skewed side gets a random salt; the other side is replicated
    across all salts (explode of a salt array), so each (key, salt)
    shuffle partition carries 1/n_salts of the hot key. Join output
    equals the plain join (each skewed row meets exactly one replica)
    — but only for how ∈ {inner, left}: under right/full_outer every
    unmatched replica of the replicated side would surface once per
    salt, so those modes are rejected rather than silently duplicated.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "unmatched rows of the replicated side would appear n_salts times"
        )
    salted = skewed.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")


def top_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """Skew diagnosis: the ``n`` heaviest key values with counts and
    the share of total rows — the measurement step before choosing a
    mitigation (create_merged-style `uniq -c` stats, A11)."""
    counts = df.groupBy(key).count()
    total = counts.agg(F.sum("count").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(key, "count", round6_det(F.col("count") / F.col("_t")).alias("share"))
        .orderBy(F.col("count").desc(), F.col(key).asc())
        .limit(n)
    )
