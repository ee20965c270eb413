from datax_spark.oracle.apply import sequential_apply, sequential_scd2

__all__ = ["sequential_apply", "sequential_scd2"]
