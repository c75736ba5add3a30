"""sf_datalake_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``signaux-faibles/sf_datalake`` (the reference): the
(entity, period) monthly-panel data model, calendar-aware window features,
as-of joins, interval algebra, configurable aggregation, ML pipeline
lifecycle — plus the large-scale training-data-pipeline operators the
reference lacks (dedup, similarity search, text analysis, multimodal
plumbing).

Design rules (see SURVEY.md §4, §7):
- DataFrame/SQL API only; Catalyst plans everything. No RDDs.
- Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs only
  where built-ins genuinely cannot express the semantics.
- Broadcast small dimensions, let AQE re-plan, keep filters/pruning
  pushdown-friendly.
"""

__version__ = "0.1.0"
