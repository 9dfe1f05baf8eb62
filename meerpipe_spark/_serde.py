"""Worker-side serialization safety.

The engine may be driven from any working directory (the driver imports
``__spark_entry__`` by path), so Spark's Python workers cannot be assumed
to have ``meerpipe_spark`` importable. Every function that executes on
workers (pandas UDFs, mapInPandas parsers, foreachBatch callbacks) must
therefore be pickled BY VALUE, not by module reference.

``cloudpickle.register_pickle_by_value`` does exactly that; we register
every loaded meerpipe_spark module. Third-party imports (numpy, pandas)
remain by-reference — they are installed on the workers.
"""

from __future__ import annotations

import sys

try:  # pyspark vendors cloudpickle
    from pyspark.cloudpickle import register_pickle_by_value
except ImportError:  # pragma: no cover
    from cloudpickle import register_pickle_by_value


def register_worker_modules() -> None:
    # Import the modules with worker-side code so they exist to register.
    import meerpipe_spark.functions.kepler  # noqa: F401
    import meerpipe_spark.operators.multimodal  # noqa: F401
    import meerpipe_spark.sources.fits  # noqa: F401
    import meerpipe_spark.streaming.events  # noqa: F401

    for name, mod in list(sys.modules.items()):
        if name.startswith("meerpipe_spark") and mod is not None:
            try:
                register_pickle_by_value(mod)
            except Exception:
                pass
