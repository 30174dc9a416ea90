"""Incremental & streaming execution (SURVEY.md §2.9).

The reference *claims* streaming (``/root/reference/README.md:4``) and
declares an ``incremental_fetcher`` plugin that doesn't exist
(``table_example.yaml:10``); this package realizes both:

- ``incremental`` — high-water-mark repeated batch;
- ``streams`` — Structured Streaming sources + ``foreachBatch`` sinks.
"""

from .incremental import HighWaterMark, incremental_read  # noqa: F401
