"""views_transformation_library_spark — a PySpark-native panel-analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``prio-data/views_transformation_library`` (the ViEWS transform library):
time-series window transforms, gaps-and-islands event counters, spatial-lag
convolutions, graph lags, missing-data imputation — plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) the reference does not have.

Data model (SURVEY.md §1): a *panel* is a long-format DataFrame keyed by
``(time_id BIGINT, unit_id BIGINT)`` with one DOUBLE column per feature.
Operators are pure ``DataFrame -> DataFrame`` functions; chains stay a single
lazy Catalyst plan until an action.
"""

__version__ = "0.1.0"

TIME = "time_id"
UNIT = "unit_id"

from .registry import REGISTRY, transform, transform_json  # noqa: E402,F401
