"""Job compiler: TableSpec → one declarative DataFrame plan.

This replaces the reference's volcano-style per-row loop
(``/root/reference/pipeline.py:18-129``) with plan construction; Catalyst
then does projection/predicate pushdown, join selection, AQE, and
whole-stage codegen (SURVEY.md §3.2, §4). Stage order preserves the
reference's dataflow exactly (SURVEY.md §7.4.4/7.4.5):

1. source scan (+ free-text ``where`` on *source* columns — pushed into
   the scan by Catalyst, ``default_fetcher.py:31,40``)
2. schema reconciliation / auto-mapping (P2/S4/S7)
3. projection + rename + per-column transform chains (P1, T1-T6)
4. external lookup joins (J1) and self-lookup key staging (J2) —
   lookups are transform plugins in the reference, so they run before
   validators (``pipeline.py:58-62``)
5. validation rules on target columns (V1-V3; fail-fast rules checked
   eagerly pre-write — §7.4.1)
6. self-lookup resolution (J2) — reference does this post-load in
   ``finalize_table``; the pre-write self-join is semantically identical
   and single-pass
7. sink

Table-level plugins (transform/validation/fetcher/loader) resolve through
the registry with the reference's precedence: table overrides global;
``transform_override: true`` discards the global chain
(``pipeline.py:54-66``, ``mappings/parser.py:112-126``).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import registry
from .operators.automap import auto_map, reconcile
from .operators.lookups import external_lookup, self_lookup
from .operators.transforms import apply_transform_chain
from .operators.validations import ErrorCheck, apply_validations, run_error_checks
from .sinks import resolve_sink
from .sources import resolve_source
from .spec import GlobalSpec, JobSpec, LookupSpec, MappingSpec, TableSpec

logger = logging.getLogger(__name__)


@dataclass
class CompiledTable:
    """A fully-built plan for one table, not yet executed."""

    spec: TableSpec
    df: DataFrame
    error_checks: list[ErrorCheck] = field(default_factory=list)


class JobContext:
    """Job-scoped context: SparkSession + specs + caches. Replaces the
    reference's per-batch ``ExecutionContext``
    (``/root/reference/core/context.py:9-34``) — there are no batches to
    track; Spark owns partitioning."""

    def __init__(self, spark: SparkSession, global_spec: GlobalSpec):
        self.spark = spark
        self.global_spec = global_spec
        self._lookup_cache: dict[str, DataFrame] = {}

    def lookup_table(self, lk: LookupSpec) -> DataFrame:
        """Dimension tables live on the target side in the reference
        (lookups query Postgres — ``default_lookup.py:71``); try target
        connector first, fall back to source. Cached per job so repeated
        rules share one scan."""
        if lk.table in self._lookup_cache:
            return self._lookup_cache[lk.table]
        conns = self.global_spec.connectors
        df = None
        errors = []
        for attempt in (self._read_target, self._read_source):
            try:
                df = attempt(lk.table)
                break
            except Exception as e:  # noqa: BLE001 — try the other side
                errors.append(e)
        if df is None:
            raise RuntimeError(f"cannot resolve lookup table {lk.table!r}: {errors}")
        self._lookup_cache[lk.table] = df
        return df

    def _read_target(self, table: str) -> DataFrame:
        conns = self.global_spec.connectors
        if conns.target_files is not None:
            from .sources.files import read_file_table

            return read_file_table(self.spark, conns.target_files, table)
        if conns.postgres is not None:
            from .sources.jdbc import read_jdbc_table

            return read_jdbc_table(self.spark, conns.postgres, table)
        raise ValueError("no target connector")

    def _read_source(self, table: str) -> DataFrame:
        return resolve_source(self.spark, self.global_spec.connectors, table)


def compile_table(ctx: JobContext, spec: TableSpec) -> CompiledTable:
    """Build the full DataFrame plan for one table."""
    g = ctx.global_spec

    # 1. scan (custom fetcher plugin may replace it — reference FetcherPlugin)
    fetcher_name = spec.fetcher_plugin or g.fetcher_plugin
    if fetcher_name not in ("default_fetcher",):
        try:
            fetcher = registry.get("fetcher", fetcher_name)
            df = fetcher(ctx, spec)
        except KeyError:
            logger.warning("fetcher plugin %r not found — using default", fetcher_name)
            df = _default_scan(ctx, spec)
    else:
        df = _default_scan(ctx, spec)

    # free-text where on source columns (S3/P5) — Catalyst pushes it down
    if spec.where:
        df = df.filter(F.expr(spec.where))

    # 2. reconcile mappings
    rules = auto_map(spec, df.columns, target_columns=None)
    rules = reconcile(rules, df.columns)

    # 3. projection + rename + scalar transform chains (one select)
    dtypes = dict(df.dtypes)
    projected = []
    for r in rules:
        col = F.col(r.source)
        col = apply_transform_chain(col, r.transform, dtypes.get(r.source, "string"))
        projected.append(col.alias(r.target or r.source))
    df = df.select(*projected)

    # table-level transform plugins (global + local chain; override flag
    # discards the global chain — ``pipeline.py:58-61``)
    for name in _transform_plugin_chain(g, spec):
        try:
            plugin = registry.get("transform", name)
        except KeyError:
            logger.warning("transform plugin %r not found — skipped "
                           "(declared-but-missing plugins are spec-by-name, SURVEY.md §2.6)", name)
            continue
        df = plugin(df, ctx)

    # 4. lookups: classify external vs self (``default_lookup.py:30-42``)
    self_rules: list[MappingSpec] = []
    for r in rules:
        if not r.lookup:
            continue
        if r.lookup.table == spec.target_table:
            self_rules.append(r)
        else:
            dim = ctx.lookup_table(r.lookup)
            df = external_lookup(df, r.target, r.lookup, dim)

    # 5. validations (on target columns, after lookups)
    vrules = [
        (r.target, v)
        for r in rules
        if r.validation
        for v in r.validation
    ]
    df, checks = apply_validations(
        df, vrules, lookup_resolver=ctx.lookup_table, error_mode="collect"
    )

    # 6. self-lookup resolution (J2) — pre-write self-join
    for r in self_rules:
        df = self_lookup(df, r.target, r.lookup)

    return CompiledTable(spec=spec, df=df, error_checks=checks)


def _default_scan(ctx: JobContext, spec: TableSpec) -> DataFrame:
    return resolve_source(
        ctx.spark,
        ctx.global_spec.connectors,
        spec.source_table,
        spec.source_schema,
        fetchsize=ctx.global_spec.batch_size,
        partition_column=spec.partition_column,
        num_partitions=spec.num_partitions,
    )


def _transform_plugin_chain(g: GlobalSpec, spec: TableSpec) -> list[str]:
    local = spec.transform_plugins or []
    if spec.transform_override:
        chain = list(local)
    else:
        chain = [n for n in g.transform_plugins if n != "default_transform"] + local
    return chain


def run_table(ctx: JobContext, spec: TableSpec) -> DataFrame:
    """Compile, run fail-fast checks, write. Returns the final DataFrame
    (also handy for tests/queries)."""
    compiled = compile_table(ctx, spec)
    run_error_checks(compiled.df, compiled.error_checks)

    loader_name = spec.loader_plugin or ctx.global_spec.loader_plugin
    if loader_name not in ("default_loader",):
        try:
            loader = registry.get("loader", loader_name)
            loader(compiled.df, ctx, spec)
            return compiled.df
        except KeyError:
            logger.warning("loader plugin %r not found — using default", loader_name)

    resolve_sink(
        compiled.df,
        ctx.global_spec.connectors,
        spec.target_table,
        spec.target_schema if ctx.global_spec.connectors.target_files is None else None,
        mode=spec.write_mode,
        **(
            {}
            if ctx.global_spec.connectors.target_files is not None
            else {"batchsize": min(ctx.global_spec.batch_size, 10000)}
        ),
    )
    return compiled.df


def run_job(spark: SparkSession, job: JobSpec) -> dict[str, int]:
    """Run every table in declared order (reference iterates
    sequentially, ``pipeline.py:39``; independent tables could be
    parallelized driver-side, kept sequential for parity/determinism).
    Returns per-table row counts for the run report."""
    ctx = JobContext(spark, job.global_spec)
    results: dict[str, int] = {}
    for spec in job.tables:
        t0 = time.time()
        df = run_table(ctx, spec)
        n = df.count()
        results[spec.target_table] = n
        logger.info(
            "%s.%s -> %s.%s: %d rows in %.1fs",
            spec.source_schema,
            spec.source_table,
            spec.target_schema,
            spec.target_table,
            n,
            time.time() - t0,
        )
    return results
