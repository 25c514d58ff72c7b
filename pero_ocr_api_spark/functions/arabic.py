"""X4 — Arabic line normalization stand-in.

The reference calls the external ``pero_ocr`` ``ArabicHelper``
(``run_client.py:218-220``): lines detected as Arabic have their
logical-order label form converted to the visual string. The sandbox
has no Arabic shaping library, so the engine defines a deterministic
stand-in with the same *shape*: per line, if the line contains Arabic
codepoints, reverse it (logical→visual order flip). Implemented three
ways (Spark Column / Python / DuckDB SQL) for oracle parity.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

ARABIC_RE = "[؀-ۿ]"
_ARABIC_PAT = re.compile(ARABIC_RE)


def is_arabic_line(line: str) -> bool:
    return bool(_ARABIC_PAT.search(line))


def normalize_arabic_py(text: str) -> str:
    """Per-line: reverse lines containing Arabic codepoints."""
    return "\n".join(
        line[::-1] if is_arabic_line(line) else line
        for line in text.split("\n")
    )


def normalize_arabic_col(col: Column) -> Column:
    lines = F.split(col, "\n", -1)
    fixed = F.transform(
        lines,
        lambda l: F.when(
            l.rlike(ARABIC_RE), F.reverse(l)
        ).otherwise(l),
    )
    return F.array_join(fixed, "\n")


def duckdb_normalize_arabic_sql(expr: str) -> str:
    pat = "'[؀-ۿ]'"
    return (
        f"array_to_string(list_transform(string_split({expr}, chr(10)), "
        f"l -> CASE WHEN regexp_matches(l, {pat}) THEN reverse(l) ELSE l END), "
        "chr(10))"
    )
