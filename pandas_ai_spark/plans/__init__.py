from .compiler import ResolverContext, SchemaCompiler, parse_order_by
from .transformations import (
    COLUMN_TRANSFORMS,
    DATAFRAME_TRANSFORMS,
    apply_transformation,
    strftime_to_spark,
)

__all__ = [
    "ResolverContext",
    "SchemaCompiler",
    "parse_order_by",
    "COLUMN_TRANSFORMS",
    "DATAFRAME_TRANSFORMS",
    "apply_transformation",
    "strftime_to_spark",
]
