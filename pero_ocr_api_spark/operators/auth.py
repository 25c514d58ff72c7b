"""API-key authentication lookups (F6/F7).

The reference authenticates every route through
``app/db/api_key.py:19-34`` — a point lookup by ``api_string`` for
USER-level access (``get_apiauth_object_by_key_u``) plus a conjunctive
``permission == SUPER_USER`` variant (``get_apiauth_object_by_key_su``)
— and gates request access with
``request_belongs_to_api_key`` (``app/main/general.py:153-157``).

These are service-edge point lookups, not data-plane operators; the
DataFrame forms below keep the exact filter semantics (equality on the
key string, optional permission enum, ``.first()`` ≡ ``limit(1)``) so
the same gate composes into batch plans (e.g. the suspension check in
``operators/scheduling.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPER_USER = "SUPER_USER"
USER = "USER"


def lookup_api_key(
    api_key: DataFrame, key_string: str, permission: str | None = None
) -> DataFrame:
    """F6 (api_key.py:19-25): ``api_string`` equality, ``first()``.
    With ``permission=SUPER_USER``: F7 (api_key.py:28-34), the
    conjunctive enum gate."""
    out = api_key.filter(F.col("api_string") == key_string)
    if permission is not None:
        out = out.filter(F.col("permission") == permission)
    return out.limit(1)


def match_api_keys(api_key: DataFrame, key_string: str | None, permission: str) -> bool:
    """api_key.py:37-52: permission-dispatched existence check. A
    SUPER_USER key satisfies a USER-level gate (the reference's
    ``@require_user_api_key`` accepts both, routes.py decorators)."""
    if key_string is None:
        return False
    if permission == SUPER_USER:
        found = lookup_api_key(api_key, key_string, SUPER_USER)
    else:
        found = lookup_api_key(api_key, key_string)
    return found.limit(1).count() > 0


def request_belongs_to_api_key(
    api_key: DataFrame, request: DataFrame, key_string: str, request_id: str
) -> bool:
    """J4/F7 (general.py:153-157): does `request_id` belong to the
    tenant holding `key_string`? One semi-join, both sides point-
    filtered."""
    key_ids = lookup_api_key(api_key, key_string).select(
        F.col("id").alias("key_id")
    )
    hit = (
        request.filter(F.col("id") == request_id)
        .join(key_ids, F.col("api_key_id") == F.col("key_id"), "left_semi")
    )
    return hit.limit(1).count() > 0
