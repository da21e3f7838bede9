"""optiprism_spark — a PySpark-native product-analytics engine.

A from-scratch re-expression of the query capabilities of the
optiprism product-analytics system (event segmentation, funnels,
behavioral segments, record search) plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal columns), built Spark-first: declarative DataFrame/SQL
plans optimized by Catalyst, with Pandas-UDF `applyInPandas` only
for the genuinely sequential operators (the funnel state machine).

Design stance (see SURVEY.md §7): no custom Catalyst rules, no RDDs.
~80% of the reference's custom operator zoo maps to native DataFrame
expressions; the rest is vectorized per-user pandas.
"""

__version__ = "0.1.0"
