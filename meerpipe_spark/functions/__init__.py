from meerpipe_spark.functions.kepler import (  # noqa: F401
    eccentric_anomaly_udf,
    mean_anomaly,
    true_anomaly,
    binary_phase_circular,
)
from meerpipe_spark.functions.timeutils import mjd_from_ts, ts_from_mjd  # noqa: F401
