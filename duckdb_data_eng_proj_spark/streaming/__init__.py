"""Structured Streaming surface: file-source ingest + windowed aggs.

The reference's closest thing to a stream is the "daily LMS updates"
batch file (take_home_exercise.md:15); here that flow is a real
Structured Streaming pipeline (SURVEY.md §2.8 ext_stream_ingest),
plus a watermarked tumbling-window aggregate over the events table.
"""

from duckdb_data_eng_proj_spark.streaming.ingest import (  # noqa: F401
    stream_clean_lms,
    stream_window_counts,
)
