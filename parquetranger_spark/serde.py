"""Executor-serialization helper.

The repo is not pip-installed, so Spark's Python workers cannot import
``parquetranger_spark`` unless the driver cwd happens to be the repo root.
Any module that ships functions to executors (pandas UDFs, mapInPandas /
applyInPandas bodies) registers itself for cloudpickle by-value pickling,
making closures self-contained. Called at import time from those modules.
"""

from __future__ import annotations

import sys


def pickle_module_by_value(module_name: str) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:
        pass
