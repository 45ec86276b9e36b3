"""PySpark-native analytics engine with the query/data-processing surface of
thaovy1508/RealTime-Voting-System (reference @ /root/reference, read-only).

The reference is a Postgres+Kafka+Streamlit election-analytics pipeline whose
entire analytical surface is 10 SQL queries (8 dashboard + 2 generator-stats,
see SURVEY.md §2) plus a declared-but-unshipped Spark Structured Streaming
layer. This package re-expresses that surface Spark-first:

- ``schemas``    — explicit StructTypes (no inference in the engine)
- ``catalog``    — parquet table loading + temp-view registration
- ``functions``  — scalar/text/vector helpers (built-in-first, UDF-last)
- ``operators``  — parametrized relational *shapes* (the reference queries are
                   instances of ~10 shapes: time-bucketed lag, ranked share,
                   cumulative trend, top-1-per-group, pivot stats, ...) plus
                   the large-scale data-pipeline operators (dedup, similarity,
                   text analysis, multimodal plumbing)
- ``plans``      — the concrete query pipelines: voting replicas and their
                   testdata instantiations used by the driver contract
- ``sources``    — readers/writers (parquet, CSV, Kafka JSON envelope)
- ``streaming``  — Structured Streaming jobs (windowed aggs, dedup, ranks)
"""

__version__ = "0.1.0"
