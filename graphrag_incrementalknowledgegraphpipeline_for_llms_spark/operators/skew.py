"""Skew mitigation: salted join for hot keys.

AQE's skew-join split (`spark.sql.adaptive.skewJoin`, on in
session.py) already repairs skewed SORT-MERGE joins at runtime by
splitting oversized partitions.  Salting is for the cases AQE can't
reach: aggregation-feeding joins where one build key dominates (the
LSH hot-bucket shape — a near-dup cluster of millions of identical
stub pages lands in one (band, bucket)), or clusters running without
AQE.

``salted_join`` distributes each left row to one of ``salt`` shards
deterministically (xxhash64 of the whole row — no RNG, reruns are
identical) and replicates the right side ``salt`` times, so a hot
key's probe rows spread over ``salt`` tasks at the cost of a
``salt``-times-larger build side.  Use when the right side is small
enough to replicate but too big (or the key too hot) to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted across ``salt`` shards.

    Output equals ``left.join(right, on, how)`` exactly (the salt and
    replica columns never escape).  ``how`` supports inner/left —
    right-outer semantics would need the replica side deduped back,
    which defeats the salting."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    row_hash = F.xxhash64(
        *[x for i, c in enumerate(left.columns) for x in (F.lit(i), F.col(c))]
    )
    salted_left = left.withColumn("_salt", F.pmod(row_hash, F.lit(salt)).cast("int"))
    replicas = right.crossJoin(
        F.broadcast(
            right.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = salted_left.join(replicas, [*on, "_salt"], how)
    return out.drop("_salt")
