"""climateiq_pipelines_spark — a PySpark-native batch analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities
surveyed from UrbanSystemsLab/climateiq-pipelines (see SURVEY.md; the
reference snapshot at /root/reference contains only a LICENSE, so the
binding capability surface is SURVEY.md §2). Everything here is idiomatic
PySpark: DataFrame/SQL logical plans, Catalyst/AQE physical planning,
Pandas UDFs only where built-in expressions cannot express the semantics.
"""

from climateiq_pipelines_spark.session import get_spark, release_blocks
from climateiq_pipelines_spark.registry import TABLES, load_table

__all__ = ["get_spark", "load_table", "TABLES", "release_blocks"]
