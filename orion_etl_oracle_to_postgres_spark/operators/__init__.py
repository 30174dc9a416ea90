"""Operator library: ETL-parity operators (transforms, validations,
lookups, automap — SURVEY.md §2.4-2.7) and [EXT] LLM-data-pipeline
operators (dedup, similarity, text analysis, multimodal — SURVEY.md §2.11).
"""

from . import transforms, validations, lookups, automap  # noqa: F401  (registers ops)
from . import dedup, similarity, text, multimodal, skew  # noqa: F401
