"""The spark-submit job entry point + idempotent writer + packaging."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import zipfile

from pero_ocr_api_spark.plans.extract import run_extract
from pero_ocr_api_spark.plans.io import write_extracted


def test_write_extracted_idempotent(spark, docs_df, media_df):
    out = tempfile.mkdtemp() + "/extracted"
    first, _ = run_extract(spark, docs_df.limit(15), media_df, run_id="a")
    n1 = write_extracted(spark, first, out)
    assert n1 == 15
    # same rows again → zero written, no duplicates
    assert write_extracted(spark, first, out) == 0
    full, _ = run_extract(spark, docs_df, media_df, run_id="b")
    n2 = write_extracted(spark, full, out)
    back = spark.read.parquet(out)
    assert back.count() == docs_df.count() == 15 + n2
    assert back.select("doc_id").distinct().count() == back.count()


def test_job_cli_end_to_end(spark):
    """Drive jobs/extract_job.py in-process: synthetic corpus → output
    + lineage parquet; resumed rerun writes nothing new."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import extract_job

    d = tempfile.mkdtemp()
    rc = extract_job.main(
        [
            "--n-docs", "40", "--seed", "7",
            "--output", f"{d}/out", "--run-id", "t1",
        ]
    )
    assert rc == 0
    assert spark.read.parquet(f"{d}/out").count() == 40
    assert spark.read.parquet(f"{d}/out_lineage").count() >= 1
    # resume: everything already done
    rc = extract_job.main(
        [
            "--n-docs", "40", "--seed", "7",
            "--output", f"{d}/out", "--run-id", "t2", "--resume",
        ]
    )
    assert rc == 0
    assert spark.read.parquet(f"{d}/out").count() == 40  # no dups


def test_pyfiles_zip_importable(tmp_path):
    res = subprocess.run(
        [sys.executable, "scripts/package_pyfiles.py", str(tmp_path)],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert res.returncode == 0, res.stderr
    zip_path = res.stdout.strip()
    with zipfile.ZipFile(zip_path) as zf:
        names = zf.namelist()
    assert "pero_ocr_api_spark/__init__.py" in names
    assert "pero_ocr_api_spark/ocr/kernel.py" in names
    # zip must be importable standalone (the executor-side contract)
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, sys.argv[1]); "
            "from pero_ocr_api_spark.ocr import kernel; "
            "print(kernel.process_media(None, None, 'x').state)",
            zip_path,
        ],
        capture_output=True, text=True,
    )
    assert probe.returncode == 0, probe.stderr
    assert probe.stdout.strip() == "NOT_FOUND"
