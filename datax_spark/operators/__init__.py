from datax_spark.operators.asof import asof_enrich_scd2, asof_join
from datax_spark.operators.dedup import lww_dedup
from datax_spark.operators.schema_evolution import evolve_schema, union_by_name
from datax_spark.operators.skew import salted_repartition

__all__ = [
    "lww_dedup",
    "salted_repartition",
    "union_by_name",
    "evolve_schema",
    "asof_join",
    "asof_enrich_scd2",
]
