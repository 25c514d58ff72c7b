"""URL canonicalization — the pre-dedup normalization every
web-crawl pipeline runs before URL-level dedup (CommonCrawl / C4 drop
exact-URL re-crawls; trackers and fragments must not defeat the
match).

Pure JVM column expressions (regexp only, RE2-compatible — no
lookarounds) with byte-identical DuckDB twins:

* scheme+host lowercased (path/query case preserved — path case is
  significant per RFC 3986, host case is not);
* ``#fragment`` stripped;
* ``utm_*`` tracking parameters stripped (plus any separator they
  carried), trailing ``?``/``&`` cleaned.

Reference analog: the request-URL handling at app/main/routes.py —
the reference keys work on normalized identifiers; this is the same
normalization at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
_UTM_RE = "utm_[a-zA-Z0-9_]+=[^&#]*&?"
_TRAIL_RE = "[?&]+$"


def canonical_url_col(url: Column) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    head = F.lower(F.regexp_extract(url, _HOST_RE, 0))
    rest = F.regexp_replace(url, _HOST_RE, "")
    no_frag = F.regexp_replace(F.concat(head, rest), "#.*$", "")
    no_utm = F.regexp_replace(no_frag, _UTM_RE, "")
    return F.regexp_replace(no_utm, _TRAIL_RE, "")


def duckdb_canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url_col` ('g' flags where Spark
    replaces globally by default)."""
    head = f"lower(regexp_extract({expr}, '{_HOST_RE}'))"
    rest = f"regexp_replace({expr}, '{_HOST_RE}', '')"
    no_frag = f"regexp_replace({head} || {rest}, '#.*$', '')"
    no_utm = f"regexp_replace({no_frag}, '{_UTM_RE}', '', 'g')"
    return f"regexp_replace({no_utm}, '{_TRAIL_RE}', '')"
