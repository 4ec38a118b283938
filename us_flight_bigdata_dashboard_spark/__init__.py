"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference dashboard (pinjunshu-a11y/US-Flight-BigData-Dashboard).

Brand-new Spark-first design — lazy DataFrames end-to-end, explicit schemas,
broadcast star joins, two-tier additive aggregation — NOT a port of the
reference's pandas+MySQL implementation. See SURVEY.md for the blueprint.

Layout:
  session     — SparkSession factory tuned for local[N] and cluster scale
  schemas     — explicit StructType schemas (engine never infers)
  sources/    — readers/sinks (CSV, Parquet, testdata catalog)
  operators/  — relational + LLM-data-pipeline operators
  functions/  — reusable column expressions (time-norm, vector math, text)
  plans/      — explain/plan-assertion helpers
  streaming/  — Structured Streaming analytics over event streams
"""

__version__ = "0.1.0"
