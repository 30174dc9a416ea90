"""[EXT] Frequency operators: exact top-k heavy hitters with bounded
shuffle (SURVEY.md §2.11).

The plain word-count top-k (``queries.text_vocab_topk``) shuffles every
distinct key's partial count — fine when the dictionary fits, a hazard
when the key space is huge (URLs, n-grams, user ids at 100 TB). The
pruned formulation here shuffles only a small candidate set and still
returns the EXACT answer, or refuses loudly:

1. **Candidates** — each scan partition builds a Misra-Gries summary
   (``m`` counters) via Arrow-batched ``mapInPandas``: every batch is
   counted vectorized (``value_counts``) and merged into the running
   summary by the mergeable-summaries rule (add, subtract the
   (m+1)-th largest, drop non-positive — Agarwal et al., "Mergeable
   Summaries", PODS'12), which preserves the n/(m+1) error bound with
   no per-row Python. At most ``m`` keys leave each partition.
2. **Exact recount** — the corpus is semi-joined against the broadcast
   candidate set and counted exactly; only candidate keys shuffle.
3. **Proof gate** — a key absent from every summary has global count
   ≤ B = Σ_p n_p/(m+1) = N/(m+1). If the k-th recounted candidate
   exceeds B, the top-k is provably exact; otherwise the operator
   raises (increase ``counters``) instead of silently returning a
   maybe-wrong answer.

Reference parity note: the reference engine
(Dims24/orion-etl-oracle-to-postgres) has no aggregation at all
(SURVEY.md §2.8); this extends the [EXT] analytics surface.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    *,
    k: int = 50,
    counters: int = 1024,
) -> DataFrame:
    """Exact top-k most-frequent values of ``key_col`` →
    ``(<key_col>, n)``, shuffling only Misra-Gries candidates. Ties
    break on the key, so the result is deterministic and
    engine-portable. Raises ``ValueError`` when exactness cannot be
    proven with the given ``counters`` budget."""
    import pandas as pd

    if k <= 0 or counters <= k:
        raise ValueError(f"need counters > k > 0, got k={k} counters={counters}")

    m = counters

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = pd.Series(dtype="int64")
        n_rows = 0
        evicted = 0
        for pdf in batches:
            s = pdf[key_col].dropna()
            n_rows += len(s)
            acc = acc.add(s.value_counts(), fill_value=0)
            if len(acc) > m:
                evicted = 1
                acc = acc.sort_values(ascending=False, kind="stable")
                sub = acc.iloc[m]
                acc = acc.iloc[:m] - sub
                acc = acc[acc > 0]
        # marker row (null key) carries the partition row count and an
        # eviction flag even when the summary is empty — the miss bound
        # must see every partition's size
        yield pd.DataFrame(
            {
                key_col: [None] + list(acc.index),
                "__part_rows": [n_rows] + [0] * len(acc),
                "__evicted": [evicted] + [0] * len(acc),
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    summaries = (
        df.select(key_col)
        .mapInPandas(
            mg_partition,
            f"{key_col} {key_type}, __part_rows long, __evicted int",
        )
        .localCheckpoint(eager=True)  # ≤ m+1 rows per partition; read twice
    )

    marker = (
        summaries.filter(F.col(key_col).isNull())
        .agg(
            F.sum("__part_rows").alias("n"),
            F.sum("__evicted").alias("ev"),
        )
        .first()
    )
    n_total = marker["n"] or 0
    no_evictions = (marker["ev"] or 0) == 0
    bound = n_total / (m + 1)

    cand = summaries.filter(F.col(key_col).isNotNull()).select(key_col).distinct()
    exact = (
        df.select(key_col)
        .join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc(key_col))
        .limit(k)
    )
    rows = exact.collect()
    # no eviction anywhere ⇒ candidates ARE the full dictionary ⇒ the
    # recount is the plain exact aggregate, whatever its size
    proven = no_evictions or (len(rows) == k and rows[-1]["n"] > bound)
    if not proven:
        kth = rows[-1]["n"] if rows else 0
        raise ValueError(
            f"cannot prove top-{k} exact: k-th candidate count {kth} <= "
            f"miss bound {bound:.1f} over {n_total} rows; raise "
            f"counters={m}"
        )
    return df.sparkSession.createDataFrame(rows, exact.schema)
