from meerpipe_spark.operators.scrunch import scrunch  # noqa: F401
from meerpipe_spark.operators.chop import get_band, chop_edge_channels, BAND_BOUNDS  # noqa: F401
from meerpipe_spark.operators.phase import phase_norm, rotate_phase, dedisperse_shift  # noqa: F401
from meerpipe_spark.operators.snr import profile_snr, cumulative_snr  # noqa: F401
from meerpipe_spark.operators.fluxcal import flux_multiplier, apply_flux  # noqa: F401
from meerpipe_spark.operators.delay_rules import parse_dlycfg, evaluate_delay_rules  # noqa: F401
