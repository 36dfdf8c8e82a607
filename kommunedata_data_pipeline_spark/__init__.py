"""kommunedata_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark (DataFrame / Spark SQL / Catalyst /
Structured Streaming) engine with the query and data-processing
capabilities of the reference repo ``rojan1918/Kommunedata_data_pipeline``
(a multi-source municipal-document ETL pipeline), re-expressed Spark-first
per SURVEY.md. The reference tells us WHAT to compute (scan → extract →
project → filter → dedup → anti-join vs sink state → per-group limit →
document transform → partitioned write, plus incremental watermark mode);
the HOW here is declarative DataFrame plans that Catalyst optimizes.

Layout (SURVEY.md §7.1):
- ``schemas``     canonical StructTypes (SURVEY §1.3)
- ``session``     tuned SparkSession builder
- ``sources``     readers + tiered fetch layer with pushed-down bounds
- ``functions``   expression library (dates incl. Danish months, strings/URLs, text)
- ``operators``   relational combinators, joins, aggregates, dedup, similarity
- ``transforms``  document-transform UDFs (Arrow-batched), multimodal stubs
- ``plans``       pipeline compiler (declarative PipelineSpec → DataFrame chain)
- ``streaming``   Structured Streaming ops over the events table
"""

__version__ = "0.1.0"
