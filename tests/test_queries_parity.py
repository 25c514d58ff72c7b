"""Every queries() entry vs its DuckDB oracle — the driver's own check,
run pre-emptively at sf0.001 so CORRECTNESS_r{N}.json has no surprises."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.parity import assert_frames_match, duck_connect

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connect(SF_DIR)


def all_query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    got = q(spark, SF_DIR)
    if oracle is None:
        # rows-only check (non-SQL-expressible op)
        assert got.count() >= 0
        return
    exp = duck.execute(oracle).df()
    assert_frames_match(got, exp, name)


def test_every_query_has_an_oracle_twin():
    # regression guard for the "every registered query has a DuckDB
    # twin" invariant — a new entry registered with a None oracle
    # silently downgrades the driver's check to rows-only
    missing = [
        name
        for name in entrymod.queries()
        if entrymod.oracle_sql().get(name) is None
    ]
    assert missing == []


def test_never_driver_sampled_entries_come_first():
    # the driver verifies a fixed-size prefix of queries() per round;
    # entries without a driver CORRECTNESS row yet must sort ahead of
    # already-verified ones so the rotation reaches them next
    from pero_ocr_api_spark.plans.queries import _DRIVER_VERIFIED

    names = list(entrymod.queries())
    first_verified = min(
        (i for i, n in enumerate(names) if n in _DRIVER_VERIFIED),
        default=len(names),
    )
    assert all(n in _DRIVER_VERIFIED for n in names[first_verified:])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
