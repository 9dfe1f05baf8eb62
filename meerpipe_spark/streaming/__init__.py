from meerpipe_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    windowed_event_counts,
    unprocessed,
    run_incremental_pipeline,
    job_state_rollup,
)
