from entwiner_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_counts,
)
from entwiner_spark.streaming.ingest import stream_edges_to_parquet
from entwiner_spark.streaming.dedup import stream_lsh_pairs

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "stream_edges_to_parquet",
    "stream_lsh_pairs",
]
