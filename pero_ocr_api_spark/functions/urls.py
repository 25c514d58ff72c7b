"""URL canonicalization — the pre-dedup normalization every
web-crawl pipeline runs before URL-level dedup (CommonCrawl / C4 drop
exact-URL re-crawls; trackers and fragments must not defeat the
match).

Pure JVM column expressions (regexp only, RE2-compatible — no
lookarounds) with byte-identical DuckDB twins:

* scheme and HOST lowercased — and only those: path/query case is
  significant per RFC 3986, and so is any ``user:password@`` userinfo
  component, which is preserved verbatim (review finding: a blanket
  authority case-fold corrupted credentials and merged distinct
  resources);
* ``#fragment`` stripped;
* ``utm_*`` tracking parameters stripped — anchored to a ``?``/``&``
  separator so a path segment or a parameter merely *containing*
  "utm_" is never touched (review finding); trailing ``?``/``&``
  cleaned.

Reference analog: the request-URL handling at app/main/routes.py —
the reference keys work on normalized identifiers; this is the same
normalization at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"
_HOST_RE = _SCHEME_RE + "[^/?#]*"
# anchored: the param NAME must start right after a ?/& separator.
# The separator is captured and re-emitted, and the param's trailing
# '&' (if any) is consumed — so '?utm_a=1&ref=2' -> '?ref=2'. Because
# regex scanning resumes AFTER the emitted separator, adjacent utm
# params need further passes: each pass halves an adjacent run
# (k -> ceil(k/2)), so `p` passes clear runs up to 2^p - 1 —
# _UTM_PASSES=4 clears 15 adjacent trackers (beyond anything real).
_UTM_RE = "([?&])utm_[a-zA-Z0-9_]+=[^&#]*&?"
_UTM_PASSES = 4
# \z (true end of input), never $: Java's $ matches BEFORE a final
# newline while RE2's does not — the one anchor whose semantics
# diverge between the two engines (review finding; same reason the
# fragment strip uses [\s\S]* instead of .*$)
_TRAIL_RE = "[?&]+\\z"
_FRAG_RE = "#[\\s\\S]*"


def canonical_url_col(url: Column) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    head = F.regexp_extract(url, _HOST_RE, 0)
    scheme = F.lower(F.regexp_extract(head, _SCHEME_RE, 0))
    auth = F.regexp_replace(head, _SCHEME_RE, "")
    # userinfo runs to the LAST '@' (greedy) — the WHATWG parse; a raw
    # '@' inside credentials stays credential-cased (review finding)
    userinfo = F.regexp_extract(auth, "^(.*@)", 1)
    host = F.lower(F.regexp_replace(auth, "^.*@", ""))
    rest = F.regexp_replace(url, _HOST_RE, "")
    out = F.regexp_replace(
        F.concat(scheme, userinfo, host, rest), _FRAG_RE, ""
    )
    for _ in range(_UTM_PASSES):
        out = F.regexp_replace(out, _UTM_RE, "$1")
    return F.regexp_replace(out, _TRAIL_RE, "")


def duckdb_canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url_col` ('g' flags where Spark
    replaces globally by default; regexp_extract misses coalesced to
    '' to match Spark's empty-string-on-no-match)."""
    head = f"coalesce(regexp_extract({expr}, '{_HOST_RE}'), '')"
    scheme = f"lower(coalesce(regexp_extract({head}, '{_SCHEME_RE}'), ''))"
    auth = f"regexp_replace({head}, '{_SCHEME_RE}', '')"
    userinfo = f"coalesce(regexp_extract({auth}, '^(.*@)', 1), '')"
    host = f"lower(regexp_replace({auth}, '^.*@', ''))"
    rest = f"regexp_replace({expr}, '{_HOST_RE}', '')"
    out = (
        f"regexp_replace({scheme} || {userinfo} || {host} || {rest}, "
        f"'{_FRAG_RE}', '')"
    )
    for _ in range(_UTM_PASSES):
        out = f"regexp_replace({out}, '{_UTM_RE}', '\\1', 'g')"
    return f"regexp_replace({out}, '{_TRAIL_RE}', '')"
