"""Ingest-time SEMANTIC eval-contamination monitor.

The batch decontamination stages (``decontaminate:`` in YAML, the
``emb_decontaminate`` query) catch benchmark leakage in the nightly
pipeline; this monitor catches it AT INGEST: every micro-batch of
embedded documents is scored against the static benchmark vectors and
the flagged count handed to a callback — "the crawl just pulled the
eval set" pages someone before the batch lands in training storage.

Stateless like the PSI/JSD monitors (``streaming/drift.py``): each
batch is scored alone via ``similarity.semantic_contamination`` (the
exact cosine gate — a contamination alarm must not lose recall to
LSH), the benchmark side is size-guarded ONCE at attach time and
broadcast per batch, and the checkpoint only tracks source offsets —
restart-safe by construction. Batch twin / drilldown:
``emb_decontaminate``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def contamination_monitor_stream(
    stream: DataFrame,
    bench: DataFrame,
    on_result: Callable[[int, int, float | None, int], None],
    *,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bench_vec: str = "embedding",
    bench_id: str = "vec_id",
    threshold: float = 0.95,
    broadcast_limit: int = 2_000_000,
):
    """Attach the monitor to a streaming frame of embedded rows: per
    micro-batch, ``on_result(batch_id, n_flagged, max_cosine, n_rows)``
    — ``n_flagged`` distinct batch ids within ``threshold`` cosine of
    ANY benchmark vector, ``max_cosine`` the worst offender (None when
    the batch is clean). Returns the started ``StreamingQuery``.

    The benchmark guard (count probe) runs once HERE, not per batch;
    the per-batch scorer passes ``broadcast_limit=None``."""
    from ..operators.similarity import (
        _guard_broadcast_side,
        semantic_contamination,
    )

    _guard_broadcast_side(
        bench, bench_id, broadcast_limit, "contamination_monitor_stream"
    )

    def _score(batch: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F

        n = batch.count()
        if n == 0:
            return
        flagged = semantic_contamination(
            batch,
            bench,
            corpus_id=id_col,
            bench_id=bench_id,
            corpus_vec=vec_col,
            bench_vec=bench_vec,
            threshold=threshold,
            broadcast_limit=None,  # guarded once at attach time
        )
        row = flagged.agg(
            F.count(F.lit(1)).alias("nf"), F.max("max_cosine").alias("mc")
        ).first()
        n_flagged = int(row["nf"]) if row is not None else 0
        max_cos = (
            float(row["mc"]) if row is not None and row["mc"] is not None
            else None
        )
        on_result(batch_id, n_flagged, max_cos, n)

    return (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
