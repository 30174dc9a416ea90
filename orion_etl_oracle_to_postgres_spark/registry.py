"""Plugin registry.

The reference's plugin system (``/root/reference/core/plugin_registry.py:28-97``)
maps names → classes implementing five row-at-a-time ABCs, with a fallback
that imports ``plugins.<name>`` and scans it. Here the same name→thing
pattern registers *expression builders* and *DataFrame functions* instead
of per-row callables (SURVEY.md §2.10):

=================  =============================================================
category           registered object signature
=================  =============================================================
``transform_op``   ``(col: Column, arg: str | None) -> Column`` — one scalar op
                   of the per-column ``transform:`` mini-language (T1-T6)
``transform``      ``(df: DataFrame, ctx) -> DataFrame`` — table-level
                   transformer plugin (reference TransformPlugin)
``validation``     ``(df: DataFrame, ctx) -> DataFrame`` — table-level
                   validator plugin (reference ValidationPlugin; runs
                   after the rule-driven validations)
``column``         ``(col: Column | None, ctx, mapping) -> Column`` —
                   per-mapping plugin (reference ``MappingRule.plugin``,
                   declared at ``mappings/parser.py:64`` but never
                   dispatched there; here it runs after the mapping's
                   transform chain; ``col`` is None for source-less
                   plugin-only mappings)
``fetcher``        ``(ctx, table_spec) -> DataFrame`` — custom source (≈ UDTF)
``loader``         ``(df: DataFrame, ctx, table_spec) -> None`` — custom sink
``auto_mapping``   ``(ctx, table_spec, source_columns, target_columns)
                   -> list[MappingSpec]`` — reference AutoMappingPlugin
=================  =============================================================

Resolution order matches the reference (table-level overrides global;
unknown ``transform_op`` names warn and pass the value through —
``/root/reference/plugins/default_transform.py:38-39``).
"""

from __future__ import annotations

import importlib
import logging
from typing import Any, Callable, Dict

logger = logging.getLogger(__name__)

_REGISTRY: Dict[str, Dict[str, Any]] = {
    "transform_op": {},
    "transform": {},
    "validation": {},
    "column": {},
    "fetcher": {},
    "loader": {},
    "auto_mapping": {},
}

_CATEGORIES = tuple(_REGISTRY)


def register(category: str, name: str) -> Callable:
    """Decorator: ``@register("transform_op", "strip")``."""
    if category not in _REGISTRY:
        raise ValueError(f"unknown plugin category {category!r}; one of {_CATEGORIES}")

    def deco(obj):
        _REGISTRY[category][name] = obj
        return obj

    return deco


def get(category: str, name: str, default: Any = None) -> Any:
    """Resolve a plugin. Falls back to importing ``<name>`` as a module
    (mirrors the reference's importlib discovery,
    ``/root/reference/core/plugin_registry.py:63-97``) in case a user
    ships plugins as standalone modules that self-register on import."""
    if category not in _REGISTRY:
        raise ValueError(f"unknown plugin category {category!r}")
    found = _REGISTRY[category].get(name)
    if found is not None:
        return found
    try:
        importlib.import_module(name)
        found = _REGISTRY[category].get(name)
    except ImportError:
        found = None
    if found is None:
        if default is not None:
            return default
        raise KeyError(f"no plugin {name!r} registered in category {category!r}")
    return found


def get_transform_op(name: str) -> Callable | None:
    """Scalar-op lookup with the reference's forgiving miss semantics:
    unknown op → warn, return None (caller applies identity)."""
    op = _REGISTRY["transform_op"].get(name)
    if op is None:
        # WARNING, not debug: a config typo ("stirp") otherwise ships
        # untransformed data with no operator-visible signal (the
        # reference logs at debug, ``default_transform.py:38-39`` — a
        # deliberate, documented divergence)
        logger.warning("unknown transform op %r — passing value through", name)
    return op


def names(category: str) -> list[str]:
    return sorted(_REGISTRY[category])
