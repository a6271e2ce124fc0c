"""financial_big_data_exp_4_spark — a PySpark-native analytics engine.

Re-expresses the full query / data-processing surface of the reference repo
``shiyu-coder/Financial-big-data-exp-4`` (a Hadoop-MapReduce + PySpark course
project over a 300k-row loan-default table) as an idiomatic Spark DataFrame
engine, and extends it with the LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) that a 100 TB
training-data pipeline needs.

Design principles (see SURVEY.md for the full blueprint):

* **DataFrame-first.** Every operator is a declarative Catalyst plan; no RDDs,
  no driver-side loops over ``collect()``.
* **No row-at-a-time Python UDFs.** The reference's three Python UDFs
  (bucket labelling, bucket-edge parsing, work-year grammar parsing —
  reference nb2 cells 6/29) are rewritten as native column expressions so the
  whole pipeline stays inside whole-stage codegen; where Python is genuinely
  required (multimodal decode) we use Arrow-batched ``mapInPandas``.
* **Deterministic, oracle-checkable results.** Aggregates over monetary
  doubles are routed through exact fixed-point/decimal arithmetic so results
  are bit-identical regardless of partitioning / aggregation order — a
  requirement both for differential testing against DuckDB and for
  reproducible pipelines at cluster scale.
* **Scale-aware physical design.** Small dimensions are broadcast, partial
  aggregation happens map-side, filters/projections are pushed to the parquet
  scan, and AQE is enabled for runtime coalescing and skew-join handling.
"""

from financial_big_data_exp_4_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
