from .executor import SQLExecutor, extract_table_names
from .sanitizer import (
    MaliciousQueryError,
    is_sql_query_safe,
    sanitize_relation_name,
)

__all__ = [
    "SQLExecutor",
    "extract_table_names",
    "MaliciousQueryError",
    "is_sql_query_safe",
    "sanitize_relation_name",
]
