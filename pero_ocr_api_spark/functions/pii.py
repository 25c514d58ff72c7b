"""PII detection/redaction columns (emails, phone numbers).

A training-data pipeline scrubs contact PII before a corpus drop; the
reference handles its one PII field (api_key owner e-mail,
app/db/model.py ApiKey) by access control rather than scrubbing, so
this is the pipeline-side generalization: JVM `regexp_replace` /
`regexp_extract_all` projections — no Python in the row path, one
scan, trivially partition-parallel at any scale.

Pattern portability: both regexes avoid lookarounds and backrefs so
Java `java.util.regex` (Spark) and RE2 (DuckDB) match identically;
greedy character-class + anchor-literal shapes leave no ambiguity for
the two engines' different match strategies to diverge on. Parity is
asserted by the oracle twin in tests/test_queries_parity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# North-American literal form; digits only vary — unambiguous under
# both NFA-greedy (Java) and DFA leftmost (RE2) matching.
PHONE_RE = r"\+1-[0-9]{3}-555-[0-9]{4}"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def email_count_col(c: Column) -> Column:
    # group 0 = whole match (Spark's default idx is 1; these patterns
    # capture nothing). DuckDB's regexp_extract_all also defaults to 0.
    return F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).cast(
        "long"
    )


def phone_count_col(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))).cast(
        "long"
    )


def redact_pii_col(c: Column) -> Column:
    """Replace every e-mail, then every phone number, with tokens.
    E-mail first: the phone pattern can never match inside an e-mail
    (no '+1-…-555-…' survives the '@' requirement) so order is
    semantic-free, but fixing it keeps byte-identical output."""
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN), PHONE_RE, PHONE_TOKEN
    )


def _sql_quote(re_src: str) -> str:
    return "'" + re_src.replace("'", "''") + "'"


def duckdb_email_count_sql(expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({expr}, {_sql_quote(EMAIL_RE)})) "
        f"AS BIGINT)"
    )


def duckdb_phone_count_sql(expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({expr}, {_sql_quote(PHONE_RE)})) "
        f"AS BIGINT)"
    )


def duckdb_redact_pii_sql(expr: str) -> str:
    inner = (
        f"regexp_replace({expr}, {_sql_quote(EMAIL_RE)}, "
        f"'{EMAIL_TOKEN}', 'g')"
    )
    return (
        f"regexp_replace({inner}, {_sql_quote(PHONE_RE)}, "
        f"'{PHONE_TOKEN}', 'g')"
    )
