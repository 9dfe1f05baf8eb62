from meerpipe_spark.plans.decimation import parse_decimation_flags, DecimationSpec  # noqa: F401
from meerpipe_spark.plans.pipeline import run_observation_pipeline, results_doc  # noqa: F401
