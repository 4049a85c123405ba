"""se_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
pipeline (hahunavth/SE-data-pipeline, surveyed in SURVEY.md) as a lazy,
Catalyst-planned PySpark DataFrame engine:

- ``session``    : SparkSession factory tuned for local[N] and cluster use
- ``catalog``    : typed schema registry + loaders for the test tables
- ``functions``  : scalar/array/text kernels (HOF-first, pandas_udf only
                   where built-ins can't express the semantics)
- ``operators``  : relational + dataflow operators (dedup, similarity,
                   windows, grouped documents, dead-letter routing)
- ``sources``    : pluggable acquire-stage sources (CSV/JSON/text/binary
                   readers; external-world fetchers behind interfaces
                   with deterministic fakes)
- ``plans``      : end-to-end pipelines mirroring the reference's entry
                   points (channel ranking, quality probe, full ingest)
- ``streaming``  : Structured Streaming restatement of the reference's
                   incremental semantics (ledger dedup, checkpoint flush,
                   windowed aggregation with watermarks)
- ``queries``    : the registry of oracle-checked queries exposed through
                   ``__spark_entry__``
"""

__version__ = "0.1.0"
