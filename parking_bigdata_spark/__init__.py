"""parking_bigdata_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capabilities of the reference project
``seunghalee1226/parking_bigdata`` (an R EDA/modeling pipeline for the
DACON parking-demand competition, see ``/root/reference/20210803_이승하.R``)
as idiomatic, scale-ready Spark DataFrame operators, plus the
LLM-data-pipeline operator family (dedup, similarity search, multimodal
columns, text analysis).

Design rules (see SURVEY.md §4): DataFrame/SQL only, single-pass fused
aggregations, broadcast dims, no driver-side loops over data, Pandas UDFs
only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"
