"""Query modules — importing each module registers its queries."""

from __future__ import annotations

import importlib

_MODULES = (
    "aggregations",
    "projections",
    "joins",
    "windows",
    "sorts_sets",
    "scalar_functions",
    "asof_range",
    "dedup",
    "similarity",
    "text_analysis",
    "curation",
    "events_json",
    "streaming_q",
    "multimodal_q",
    "udf_surface",
    "sql_surface",
    "extraction_q",
    "sources_q",
)

_loaded = False


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        try:
            importlib.import_module(f"{__name__}.{mod}")
        except ModuleNotFoundError as e:
            # Allow partially built query surface during development only if
            # the missing module is one of ours that doesn't exist yet.
            if f".{mod}" not in str(e) and mod not in str(e):
                raise
    _loaded = True
