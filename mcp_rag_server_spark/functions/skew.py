"""Skew mitigation: salted join.

AQE's skew-join splitting handles most skew at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); salting is the
explicit fallback for pathological keys (one key >> everything — the
classic null-key or hot-user case) or for engines/stages AQE can't
rewrite (e.g. aggregations feeding a join).

Pattern: the big side adds a deterministic salt in [0, n); the small
side is exploded n times, one copy per salt; the join key becomes
(key, salt), spreading one hot key over n shuffle partitions. The
small side grows n-fold — acceptable because it is small (that's why
the key is hot on the *other* side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` with ``small`` on column ``on``, spreading each of
    big's keys across ``n_salts`` shuffle partitions.

    The salt is a deterministic hash of big's full row (not rand()): the
    same input always produces the same plan + partitioning, which keeps
    golden tests and retried tasks stable. Salt values don't affect the
    join result — any assignment is correct; determinism is purely an
    operational property.
    """
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
