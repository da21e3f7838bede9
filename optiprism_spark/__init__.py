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

from .api import parse_event_segmentation, parse_funnel  # noqa: E402
from .operators.funnel import funnel_attempts, funnel_report  # noqa: E402
from .queries.event_segmentation import run_event_segmentation  # noqa: E402
from .schema import load_table, load_tables, register_views  # noqa: E402
from .session import get_spark  # noqa: E402

__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "register_views",
    "run_event_segmentation",
    "funnel_attempts",
    "funnel_report",
    "parse_event_segmentation",
    "parse_funnel",
    "__version__",
]
