"""saas_analytics_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities declared by the reference
repo ``ray-dataworks1/saas-analytics-pipeline`` (a dbt + BigQuery ELT
warehouse; see /root/reference) as an idiomatic Spark DataFrame/SQL engine:

- layered ELT (raw -> staging -> intermediate -> marts) as a model registry
  (``registry.py``) where Catalyst is the planner/optimizer,
- a declarative data-quality framework (``quality/``) mirroring dbt generic
  tests (unique / not_null / relationships / accepted_values / freshness),
- analytic marts (revenue, funnel, attribution, sessionization, SCD2) built
  on windows + joins (``marts.py``, ``operators/``),
- large-scale training-data-pipeline extensions: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), embedding similarity search, text analysis,
  multimodal binary-column plumbing (``operators/``),
- a Structured Streaming slice with batch twins (``streaming/``).

Everything is public-API PySpark: DataFrame ops + Spark SQL, AQE enabled,
broadcast hints for dims, no custom Catalyst rules (SURVEY.md section 4).
"""

__version__ = "0.1.0"
