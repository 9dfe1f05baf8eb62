"""meerpipe_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of OZGrav/meerpipe (see SURVEY.md).

The engine is DataFrame/SQL-first: every reference operator is re-expressed
as declarative Spark relational primitives (filters, broadcast joins,
hash aggregations, window functions) so Catalyst/Tungsten/AQE pick the
physical strategy; Arrow-vectorized pandas UDFs are used only for the
genuinely iterative numeric kernels (Kepler solve) and opaque-binary
multimodal decoding.
"""

__version__ = "0.1.0"

from meerpipe_spark.session import get_spark  # noqa: F401
from meerpipe_spark.io import load_tables, register_views, TABLES  # noqa: F401
from meerpipe_spark._serde import register_worker_modules as _register_worker_modules

# Worker processes may not have this package on sys.path (the driver can
# run from any cwd) — force by-value pickling of all worker-side closures.
_register_worker_modules()
