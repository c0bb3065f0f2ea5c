"""Sources: driver testdata loaders and the events->samples mapping."""

from redis_lsm_timeseries_spark.sources.testdata import (
    TABLES,
    events_as_samples,
    load_table,
    load_tables,
)

__all__ = ["TABLES", "events_as_samples", "load_table", "load_tables"]
