from datax_spark.sources.readers import cast_with_quarantine, jdbc_split_predicates, read_source

__all__ = ["read_source", "jdbc_split_predicates", "cast_with_quarantine"]
