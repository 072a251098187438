"""SQL safety gates — SELECT-only sanitizer + identifier hygiene.

Reference parity: pandasai/helpers/sql_sanitizer.py:19-111 (keyword
blocklist + parse check) and the relation-name rules at :19-31. These are
engine-agnostic string checks and are re-implemented here (no sqlglot in
this environment); the structural SELECT-only check is done with Spark's
own SQL parser in :mod:`pandas_ai_spark.sql.executor`.
"""

from __future__ import annotations

import os
import re

# Dangerous keyword patterns, matched case-insensitively against the query
# and all subqueries (superset of the reference's ~35 regexes at
# sql_sanitizer.py:52-88, extended with Spark-specific write paths).
_BLOCKED_PATTERNS = [
    r"\bINSERT\b",
    r"\bUPDATE\b",
    r"\bDELETE\b",
    r"\bDROP\b",
    r"\bCREATE\b",
    r"\bALTER\b",
    r"\bTRUNCATE\b",
    r"\bGRANT\b",
    r"\bREVOKE\b",
    r"\bEXEC(UTE)?\b",
    r"\bMERGE\b",
    r"\bREPLACE\s+INTO\b",
    r"\bATTACH\b",
    r"\bDETACH\b",
    r"\bCOPY\b",
    r"\bPRAGMA\b",
    r"\bCALL\b",
    r"\bVACUUM\b",
    r"\bEXPORT\b",
    r"\bIMPORT\b",
    r"\bINSTALL\b",
    r"\bLOAD\s+DATA\b",
    r"\bINTO\s+OUTFILE\b",
    r"\bINTO\s+DUMPFILE\b",
    r"\bSLEEP\s*\(",
    r"\bBENCHMARK\s*\(",
    r"\bPG_SLEEP\s*\(",
    # JVM reflection escape hatches: java_method('java.lang.System','getenv',
    # ...) would execute arbitrary static methods (env exfiltration, Thread
    # .sleep DoS) straight through the SELECT-only gate. Spark also exposes
    # them under the 'reflect' alias.
    r"\bREFLECT\s*\(",
    r"\bJAVA_METHOD\s*\(",
    # Session info disclosure (reference blocks USER()/VERSION() similarly,
    # sql_sanitizer.py:69-80).
    r"\bCURRENT_USER\b",
    r"\bSESSION_USER\b",
    r"\bVERSION\s*\(",
    r"\bWAITFOR\b",
    r"\bXP_CMDSHELL\b",
    r"\bSHUTDOWN\b",
    r"\bSET\s+ROLE\b",
    r"\bLOCK\s+TABLE\b",
    r"\bREFRESH\s+TABLE\b",
    r"\bCACHE\s+TABLE\b",
    r"\bUNCACHE\b",
    r"\bCLEAR\s+CACHE\b",
    r"\bADD\s+(JAR|FILE|ARCHIVE)\b",
    r"\bRESET\b",
    r"--",
    r"/\*",
    r"\bOR\s+1\s*=\s*1\b",
    r"\bUNION\s+ALL\s+SELECT\s+NULL\b",
]
_BLOCKED_RE = [re.compile(p, re.IGNORECASE) for p in _BLOCKED_PATTERNS]


class MaliciousQueryError(Exception):
    """Raised when a query references unauthorized tables or fails the
    SELECT-only gate (reference: pandasai/exceptions.py)."""


def sanitize_relation_name(name: str) -> str:
    """File/table name → safe SQL identifier: strip extension, keep
    ``[A-Za-z0-9_]``, max 64 chars, leading digit prefixed
    (sql_sanitizer.py:19-31)."""
    base = os.path.splitext(os.path.basename(name))[0]
    clean = re.sub(r"[^A-Za-z0-9_]", "_", base)[:64]
    if not clean or clean[0].isdigit():
        clean = "t_" + clean
    return clean.lower()


def _strip_strings(sql: str) -> str:
    """Remove string literals so blocklist keywords inside literals don't
    false-positive ('DROP' in a product name is fine)."""
    return re.sub(r"'(?:[^']|'')*'", "''", sql)


def is_sql_query_safe(sql: str) -> bool:
    """SELECT-only textual gate. Statement must start with SELECT/WITH,
    contain a single statement, and match none of the blocklist."""
    stripped = sql.strip().rstrip(";").strip()
    if ";" in stripped:
        return False
    head = re.sub(r"^[\s(]+", "", stripped).split(None, 1)
    if not head or head[0].upper() not in ("SELECT", "WITH"):
        return False
    scrubbed = _strip_strings(stripped)
    return not any(p.search(scrubbed) for p in _BLOCKED_RE)
