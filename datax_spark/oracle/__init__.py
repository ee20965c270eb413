from datax_spark.oracle.apply import sequential_apply

__all__ = ["sequential_apply"]
