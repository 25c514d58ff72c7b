"""Engine registry: custom span processors + versioned lookup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pero_ocr_api_spark.plans.extract import run_extract
from pero_ocr_api_spark.plans.registry import (
    DEFAULT_ENGINE,
    Engine,
    EngineRegistry,
)


def test_latest_version_lookup():
    reg = EngineRegistry()
    reg.register(Engine("czech", "2022-01-01"))
    reg.register(Engine("czech", "2022-06-01"))
    reg.register(Engine("arabic", "2022-03-01"))
    assert reg.latest("czech").version == "2022-06-01"
    assert reg.latest("arabic").version == "2022-03-01"
    with pytest.raises(KeyError):
        reg.latest("missing")
    with pytest.raises(ValueError):
        reg.register(Engine("czech", "2022-01-01"))


def test_custom_engine_changes_text_path(spark, docs_df, media_df):
    shouty = Engine(
        name="shouty",
        version="v9",
        processors={
            "html": lambda c: F.upper(
                DEFAULT_ENGINE.processors["html"](c)
            ),
            "text": lambda c: F.upper(F.coalesce(c, F.lit(""))),
        },
    )
    out, _ = run_extract(
        spark, docs_df.limit(5), media_df, run_id="eng", engine=shouty
    )
    texts = [
        s["text"]
        for r in out.collect()
        for s in r.spans
        if s["kind"] != "media" and s["text"]
    ]
    assert texts
    assert all(t == t.upper() for t in texts)


def test_engine_config_reaches_kernel(spark, docs_df, media_df):
    """Engine name/version must be stamped into the ALTO export
    (reference: create_ocr_processing_element, run_client.py:203-207)."""
    eng = Engine(name="alto_stamp_engine", version="v42")
    out, _ = run_extract(
        spark, docs_df, media_df, run_id="eng2", engine=eng
    )
    row = out.filter("alto_xml is not null").first()
    assert "<softwareName>alto_stamp_engine</softwareName>" in row.alto_xml
    assert "<softwareVersion>v42</softwareVersion>" in row.alto_xml
