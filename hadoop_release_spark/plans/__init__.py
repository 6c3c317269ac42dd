"""Contract query plans, one module per SURVEY.md §2 category."""

from __future__ import annotations

import importlib

_MODULES = (
    "a_scans",
    "b_filters",
    "c_joins",
    "d_aggregates",
    "e_windows",
    "f_sorts",
    "g_setops",
    "h_scalars",
    "i_mapreduce",
    "j_streaming",
    "k_udfs",
    "l_llm",
    "l_llm_ext",
    "l_pipeline",
    "m_multimodal",
    "s_stretch",
)

_loaded = False


def load_all() -> None:
    """Import every plans module so its ``@register`` calls run."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(f"hadoop_release_spark.plans.{mod}")
    _loaded = True
