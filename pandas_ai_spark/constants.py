"""Engine constants.

Mirrors the reference's public contract (reference: pandasai/constants.py:
35-81) — same five declared column types, same source-type lists, same 28
transformation names (+ ``standardize_categories``) — so a reference user's
schema.yaml files load unchanged.
"""

LOCAL_SOURCE_TYPES = ["csv", "parquet"]
REMOTE_SOURCE_TYPES = [
    "mysql",
    "postgres",
    "cockroachdb",
    "sqlserver",
    "data",
    "yahoo_finance",
    "bigquery",
    "snowflake",
    "databricks",
    "oracle",
    "jdbc",  # raw-URL passthrough (embedded Derby/H2, custom dialects)
]
SQL_SOURCE_TYPES = ["mysql", "postgres", "cockroachdb", "sqlserver", "oracle",
                    "jdbc"]

VALID_COLUMN_TYPES = ["string", "integer", "float", "datetime", "boolean"]
# Extended (beyond-reference) types used by the pipeline operators; the
# public 5-type schema surface stays reference-compatible, these are
# additive for embedding / multimodal columns.
EXTENDED_COLUMN_TYPES = ["array_float", "binary", "uuid"]

VALID_TRANSFORMATION_TYPES = [
    "anonymize",
    "convert_timezone",
    "to_lowercase",
    "to_uppercase",
    "strip",
    "round_numbers",
    "scale",
    "format_date",
    "to_numeric",
    "to_datetime",
    "fill_na",
    "replace",
    "extract",
    "truncate",
    "pad",
    "clip",
    "bin",
    "normalize",
    "standardize",
    "map_values",
    "rename",
    "encode_categorical",
    "validate_email",
    "validate_date_range",
    "normalize_phone",
    "remove_duplicates",
    "validate_foreign_key",
    "ensure_positive",
    "standardize_categories",
]

# Spark type for each declared public type (reference infers the same five
# from pandas dtypes at pandasai/dataframe/base.py:157-173).
SPARK_TYPE_FOR = {
    "string": "string",
    "integer": "bigint",
    "float": "double",
    "datetime": "timestamp",
    "boolean": "boolean",
    "array_float": "array<float>",
    "binary": "binary",
    "uuid": "string",
}

DEFAULT_CHART_DIRECTORY = "exports/charts"
