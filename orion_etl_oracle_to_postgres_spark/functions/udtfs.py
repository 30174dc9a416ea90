"""[EXT] Python user-defined TABLE functions (Spark 4 UDTF API) —
SURVEY.md §2.10's plugin story extended to the newest extension surface
next to the Python DataSource (``sources/pydatasource.py``).

A UDTF is the right tool where one input row expands into a VARIABLE
number of typed rows through logic that genuinely needs Python — the
lateral-join form keeps the expansion inside the executor (no driver
collect, parallelism preserved per partition). It is still per-row
Python underneath (Arrow-batched transfer with ``useArrow=True``), so
anything expressible with explode/transform stays JVM-side
(``chunking.py``, ``text.py``); these exist for the genuinely-custom
cases and to pin the API's behavior with a differential oracle.

Registration: ``register_udtfs(spark)`` → ``split_sentences`` usable in
SQL as ``FROM docs d, LATERAL split_sentences(d.text) s``.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# ASCII-explicit trim class: Python's \s and RE2's \s disagree on
# unicode whitespace, so the differential oracle pins the exact set.
_TRIM = re.compile(r"^[ \t\n\r]+|[ \t\n\r]+$")
_PATTERNS: dict = {}


@udtf(returnType="sent_idx int, sentence string", useArrow=True)
class SplitSentences:
    """One row per segment: split ``text`` on the regex ``pattern``
    (e.g. ``[.!?]+`` for sentences), trim ASCII whitespace, drop
    empties; ``sent_idx`` is 1-based among KEPT segments. NULL text
    yields no rows (the lateral join drops the doc, matching the
    oracle's ``WHERE text IS NOT NULL``). Patterns are compiled once
    per worker (tiny per-worker cache keyed by the pattern string)."""

    def eval(self, text, pattern):
        if text is None or pattern is None:
            return
        rx = _PATTERNS.get(pattern)
        if rx is None:
            rx = _PATTERNS[pattern] = re.compile(pattern)
        i = 0
        for part in rx.split(text):
            p = _TRIM.sub("", part)
            if p:
                i += 1
                yield i, p


def register_udtfs(spark) -> None:
    """Idempotent: re-registering overwrites with the same definition."""
    spark.udtf.register("split_sentences", SplitSentences)
