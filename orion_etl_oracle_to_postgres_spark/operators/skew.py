"""Skew-mitigation joins (SURVEY.md §4 / 100 TB design).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``, on in
session.py) handles most imbalance at runtime; these helpers cover the
cases AQE can't fix:

* a handful of hot keys so large that even split partitions overwhelm a
  task (classic web-scale power-law keys), and
* deterministic plans for engines/tests where runtime re-planning is
  disabled.

``salted_join`` implements the standard salt-and-replicate scheme: the
skewed (big) side gets a uniform random salt in ``[0, salt)`` appended
to its key; the other side is replicated ``salt`` times (explode of a
literal range — NOT a shuffle, the replicate side is usually the small
one); the join key becomes (key, salt), so one hot key spreads across
``salt`` reducers. Row multiplicity is unchanged: every big-side row
joins exactly the replicas carrying its salt value.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    other: DataFrame,
    on: List[str],
    how: str = "inner",
    *,
    salt: int = 16,
    hot_keys: Optional[DataFrame] = None,
) -> DataFrame:
    """Equi-join with the big side salted against key skew.

    ``how`` supports inner/left (the big side must be the left/outer
    side — salting the null-producing side would duplicate unmatched
    rows). With ``hot_keys`` (a 1-column DataFrame of the skewed key
    values, e.g. from a pre-pass ``groupBy(key).count()`` top-N), only
    hot rows are salted and the replicate blow-up applies to the hot
    subset alone: cold keys join salt=0 against replica 0.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 2:
        return big.join(other, on, how)

    if hot_keys is not None:
        hk = F.broadcast(
            hot_keys.toDF(*on).withColumn("__hot", F.lit(True))
        )
        big_s = (
            big.join(hk, on, "left")
            .withColumn(
                _SALT,
                F.when(
                    F.col("__hot").isNotNull(),
                    (F.rand(42) * salt).cast("int"),
                ).otherwise(F.lit(0)),
            )
            .drop("__hot")
        )
        rep = other.join(hk, on, "left").withColumn(
            "__reps",
            F.when(
                F.col("__hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(salt - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        other_s = rep.withColumn(_SALT, F.explode("__reps")).drop("__reps", "__hot")
    else:
        big_s = big.withColumn(_SALT, (F.rand(42) * salt).cast("int"))
        other_s = other.withColumn(
            _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
    return big_s.join(other_s, on + [_SALT], how).drop(_SALT)
