from datax_spark.functions.transforms import (
    TransformChain,
    dx_encryption,
    dx_filter,
    dx_filter_drops,
    dx_json,
    dx_pad,
    dx_replace,
    dx_substr,
)

__all__ = [
    "dx_substr",
    "dx_pad",
    "dx_replace",
    "dx_filter",
    "dx_filter_drops",
    "dx_json",
    "dx_encryption",
    "TransformChain",
]
