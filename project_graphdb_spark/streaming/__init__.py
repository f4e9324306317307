from project_graphdb_spark.streaming.ops import (  # noqa: F401
    sessionize,
    sliding_window_counts,
    tumbling_window_stats,
)
