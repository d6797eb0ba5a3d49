"""spark_streaming_twitter_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``gunjanvishwakarma/spark-streaming-twitter`` (surveyed in SURVEY.md):
three continuous queries over a tweet-like stream (trending hashtag,
per-second throughput, running total) — plus the relational core and the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) needed to run the same workloads at 100 TB scale.

Design rules (SURVEY.md §3.4/§4):
- DataFrame/SQL only in hot paths; Catalyst optimizes, whole-stage codegen on.
- No opaque row lambdas: JSON parse via ``from_json``, term extraction via
  ``regexp_extract_all``/``split`` + ``explode`` — all pushdown-transparent.
- Aggregations decompose into partial+final shapes (two-stage argmax,
  sharded global count); no map-typed UDAF buffers.
- Python UDFs only where built-ins can't express the op, always Arrow/pandas
  batched, never row-at-a-time.
"""

from spark_streaming_twitter_spark.registry import QUERIES, QuerySpec, query

__all__ = ["QUERIES", "QuerySpec", "query"]
