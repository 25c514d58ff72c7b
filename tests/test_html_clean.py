"""X9 cleaner: Spark / Python / DuckDB three-way parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pero_ocr_api_spark.functions.arabic import (
    duckdb_normalize_arabic_sql,
    normalize_arabic_col,
    normalize_arabic_py,
)
from pero_ocr_api_spark.functions.html_clean import (
    clean_html_col,
    clean_html_py,
    duckdb_clean_html_sql,
)

SAMPLES = [
    "<html><head><script>var x=1;</script><style>p{}</style></head><body>"
    "<nav>Home | <a href='#'>About</a></nav><p>Hello &amp; welcome.</p>"
    "<div><a href='x'>link1</a> <a href='y'>link2</a></div>"
    "<div class='ad'>BUY NOW!!!</div><p>Second   paragraph<br>with break.</p>"
    "<footer>(c) 2024 Corp</footer><!-- hidden --></body></html>",
    "plain text no tags at all",
    "",
    "<p></p><p>only&nbsp;one</p>",
    "<div>" + "long words here " * 10 + "<a href='z'>" + "anchor " * 14 + "</a></div>",
    "<ul><li>item one</li><li>item two</li></ul>",
    "<p>&lt;escaped&gt; &quot;quotes&quot; &#39;apos&#39;</p>",
]


def test_three_way_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "id int, html string"
    )
    spark_out = {
        r.id: r.c
        for r in df.select("id", clean_html_col(F.col("html")).alias("c")).collect()
    }
    py_out = {i: clean_html_py(s) for i, s in enumerate(SAMPLES)}
    con = duckdb.connect()
    con.execute("create table t(id int, html varchar)")
    con.executemany("insert into t values (?,?)", list(enumerate(SAMPLES)))
    duck_out = dict(
        con.execute(f"select id, {duckdb_clean_html_sql('html')} from t").fetchall()
    )
    for i in range(len(SAMPLES)):
        assert spark_out[i] == py_out[i] == duck_out[i], (
            i,
            spark_out[i],
            py_out[i],
            duck_out[i],
        )


def test_boilerplate_removed():
    out = clean_html_py(SAMPLES[0])
    assert "var x=1" not in out
    assert "Home" not in out  # nav dropped
    assert "2024 Corp" not in out  # footer dropped
    assert "link1" not in out  # link-dominated block dropped
    assert "Hello & welcome." in out
    assert "Second paragraph\nwith break." in out


def test_pure_boilerplate_cleans_to_empty():
    html = (
        "<html><body><nav>a | b</nav>"
        "<footer>Copyright 2024. All rights reserved.</footer></body></html>"
    )
    assert clean_html_py(html) == ""


def test_arabic_parity(spark):
    samples = ["hello\nمرحبا بالعالم\nworld", "no arabic", "", "سلام"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "id int, s string")
    spark_out = {
        r.id: r.c
        for r in df.select(
            "id", normalize_arabic_col(F.col("s")).alias("c")
        ).collect()
    }
    py_out = {i: normalize_arabic_py(s) for i, s in enumerate(samples)}
    con = duckdb.connect()
    con.execute("create table t(id int, s varchar)")
    con.executemany("insert into t values (?,?)", list(enumerate(samples)))
    duck_out = dict(
        con.execute(
            f"select id, {duckdb_normalize_arabic_sql('s')} from t"
        ).fetchall()
    )
    for i in range(len(samples)):
        assert spark_out[i] == py_out[i] == duck_out[i]
    assert py_out[0].split("\n")[1] == "مرحبا بالعالم"[::-1]
