from meerpipe_spark.sources.par import read_par_df, par_to_map  # noqa: F401
from meerpipe_spark.sources.psrflux import read_dynspec  # noqa: F401
from meerpipe_spark.sources.fits import read_fits_headers  # noqa: F401
