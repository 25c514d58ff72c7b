"""spark-submit entry point for the training-data curation pipeline.

The batch composition a pretraining ingest runs over a crawled corpus,
chaining the repo's curation operators in their canonical
cheap-filter → exact-verify order:

1. quality gate      — lang-ID agreement, quality score, token band
                       (`training_filter_pipeline` predicates);
2. repetition gate   — Gopher-style duplicate-token / duplicate-3-gram
                       fractions (integer cross-multiplications);
2b. LM quality gate  — (with --lm-tail-pct) CCNet-style perplexity
                       filter: score every survivor under the
                       survivors' own bigram model
                       (operators/lm.bigram_lm_scores), drop the worst
                       P percent by average log-probability (cutoff =
                       one distributed percentile sketch, reported);
3. exact dedup       — md5 fingerprint, keep lowest doc_id;
4. near dedup        — MinHash → banded LSH (skew-capped buckets) →
                       n-gram Jaccard verify ≥ threshold, keep min id;
4b. embedding dedup  — (with --embeddings) corpus-scale ANN self-join
                       (bucketed sign-LSH, clique→star cap, NO
                       broadcast of either side): drop the higher id
                       of every pair with cosine ≥ --cosine — the 5th
                       dedup family, semantic near-dups that share no
                       n-grams;
4c. closure          — (with --closure) union the text + embedding
                       pair lists and run connected components
                       (min-label propagation + pointer jumping),
                       keeping exactly one doc (min id) per dup
                       component: pairwise drop-the-higher-id
                       under-dedups chain-shaped dup graphs because
                       near-dup similarity is not transitive;
4d. incremental      — (with --band-index / --embedding-index) drop
                       batch docs that near-dup the HISTORICAL corpus
                       via the persistent bucketed indexes
                       (jobs/build_dedup_index.py): the corpus was
                       hashed once at index-build time, only the batch
                       hashes here, verification is candidates-only —
                       the daily-ingest shape; history wins;
5. mix sampling      — deterministic md5-hash stratified sampling by
                       lang (reproducible across runs/cluster sizes;
                       unlisted langs keep 100%).

Outputs the kept doc_id list plus a one-line JSON funnel report with
per-stage counts AND the LSH skew diagnostics (how many buckets the
`MAX_BUCKET` star-cap collapsed, largest bucket seen) — for both the
text LSH and the embedding LSH — the metric a 100 TB run must
surface, since a silently-capped mega-bucket is the difference
between "covered everything" and "truncated the web's boilerplate
cluster". --output-rows additionally writes the kept *rows*
repartitioned by doc_id hash (the bucket(doc_id)-clustered,
Iceberg-shaped handoff a downstream training-mix job reads).

    spark-submit --py-files dist/pero_ocr_api_spark.zip \\
        jobs/curate_job.py \\
        --documents s3://bucket/documents --output s3://bucket/kept_ids \\
        --embeddings s3://bucket/embeddings
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--documents", required=True, help="documents table path")
    p.add_argument("--output", required=True, help="kept doc_id table path")
    p.add_argument("--jaccard", type=float, default=0.5)
    p.add_argument(
        "--embeddings",
        default=None,
        help="embeddings table path (vec_id = doc_id); enables the "
        "embedding near-dup stage",
    )
    p.add_argument(
        "--cosine", type=float, default=0.999,
        help="embedding near-dup cosine threshold",
    )
    p.add_argument(
        "--output-rows",
        default=None,
        help="also write kept rows repartitioned by doc_id hash "
        "(Iceberg-shaped handoff)",
    )
    p.add_argument(
        "--closure",
        action="store_true",
        help="transitive dedup: union the text-LSH and embedding pair "
        "lists, run connected components, keep one doc (min id) per "
        "component. The pairwise default drops every pair's higher id, "
        "which under-dedups chain-shaped dup graphs (A~B, B~C with "
        "A<B<C keeps both A and the un-paired chain interior); the "
        "closure is the exact keep-one-per-cluster semantics.",
    )
    p.add_argument(
        "--lm-tail-pct",
        type=float,
        default=None,
        help="drop the worst P%% of quality-gate survivors by average "
        "bigram log-probability under the survivors' own corpus model "
        "(CCNet-style perplexity tail cut)",
    )
    p.add_argument(
        "--band-index",
        default=None,
        help="persistent text LSH band index TABLE (written by "
        "jobs/build_dedup_index.py): additionally drop batch docs that "
        "near-dup the HISTORICAL corpus — only the batch is hashed "
        "(plans/io.band_index_candidates); requires --corpus for the "
        "candidates-only Jaccard verify",
    )
    p.add_argument(
        "--corpus",
        default=None,
        help="historical corpus documents path (doc_id, text) — the "
        "verify side of --band-index",
    )
    p.add_argument(
        "--embedding-index",
        default=None,
        help="persistent embedding ANN band index TABLE "
        "(build_dedup_index.py --embeddings): additionally drop batch "
        "docs whose embedding near-dups the historical corpus — only "
        "the batch is hashed (plans/io.embedding_index_candidates); "
        "requires --embeddings (batch vectors) and --corpus-embeddings "
        "(historical vectors) for the exact-cosine verify",
    )
    p.add_argument(
        "--corpus-embeddings",
        default=None,
        help="historical corpus embeddings path (vec_id, embedding) — "
        "the verify side of --embedding-index",
    )
    p.add_argument("--no-sampling", action="store_true")
    p.add_argument("--cores", type=int, default=None, help="local mode only")
    args = p.parse_args(argv)
    if args.lm_tail_pct is not None and not (0 < args.lm_tail_pct < 100):
        p.error("--lm-tail-pct must be in (0, 100)")
    if args.band_index and not args.corpus:
        p.error("--band-index requires --corpus")
    if args.embedding_index and not (
        args.embeddings and args.corpus_embeddings
    ):
        p.error(
            "--embedding-index requires --embeddings and "
            "--corpus-embeddings"
        )
    return args


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = SparkSession.getActiveSession()
    if spark is None:
        from pero_ocr_api_spark.session import get_spark

        spark = get_spark(app_name="curate_job", cores=args.cores)

    from pero_ocr_api_spark.functions import text_stats as ts
    from pero_ocr_api_spark.operators import dedup
    from pero_ocr_api_spark.plans.queries_textops import (
        QUALITY_MIN,
        REP_GRAM_DEN,
        REP_GRAM_NUM,
        REP_TOKEN_DEN,
        REP_TOKEN_NUM,
        SAMPLE_RATES_PCT,
        TOKENS_MAX,
        TOKENS_MIN,
        _SAMPLE_SPACE,
    )

    t0 = time.monotonic()
    docs = spark.read.parquet(args.documents).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang", "source"
    )
    n_input = docs.count()

    # -- 1+2: per-doc gates, one scan ------------------------------------
    t = F.col("text")
    toks = dedup.tokens_col(t)
    n_tok = F.size(toks)
    nd_tok = F.size(F.array_distinct(toks))
    grams = F.when(
        n_tok >= 3,
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_tok - 3, F.lit(0))),
            lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_g, nd_g = F.size(grams), F.size(F.array_distinct(grams))
    gated = docs.select(
        "doc_id",
        "text",
        "lang",
        (
            (ts.lang_guess_col(t) == F.col("lang"))
            & (ts.quality_score_col(t) >= QUALITY_MIN)
            & ts.token_count_col(t).between(TOKENS_MIN, TOKENS_MAX)
        ).alias("quality_ok"),
        (
            (F.lit(REP_TOKEN_DEN) * (n_tok - nd_tok) <= F.lit(REP_TOKEN_NUM) * n_tok)
            & ((F.lit(REP_GRAM_DEN) * (n_g - nd_g) <= F.lit(REP_GRAM_NUM) * n_g) | (n_g == 0))
        ).alias("repetition_ok"),
    )
    survivors = gated.filter(F.col("quality_ok") & F.col("repetition_ok")).select(
        "doc_id", "text", "lang"
    ).cache()
    n_gated = survivors.count()

    # -- 2b (--lm-tail-pct): CCNet-style LM perplexity tail cut ----------
    lm_report = None
    if args.lm_tail_pct:
        from pero_ocr_api_spark.operators.lm import bigram_lm_scores

        # cached: the scoring DAG (explode + gram window + unigram
        # join) feeds BOTH the cutoff aggregate and the survivors join
        scores = bigram_lm_scores(survivors).select(
            "doc_id", (F.col("sum_lp") / F.col("n_bigrams")).alias("avg_lp")
        ).cache()
        # one distributed percentile sketch -> a scalar cutoff (a
        # 1-row metric read, not a data path)
        cutoff = scores.agg(
            F.percentile_approx("avg_lp", args.lm_tail_pct / 100.0, 10000)
        ).first()[0]
        # docs too short to score (no bigrams) pass through — the
        # token-band gate above already owns the length policy
        pre_lm = survivors
        survivors = (
            survivors.join(scores, "doc_id", "left")
            .filter(F.col("avg_lp").isNull() | (F.col("avg_lp") >= cutoff))
            .select("doc_id", "text", "lang")
            .cache()
        )
        n_gated_lm = survivors.count()  # materializes before the release
        pre_lm.unpersist()
        scores.unpersist()
        lm_report = {
            "after_lm_filter": n_gated_lm,
            "cutoff_avg_lp": cutoff,
            "tail_pct": args.lm_tail_pct,
        }

    # -- 3: exact dedup (keep lowest doc_id per fingerprint) -------------
    fp = survivors.select(
        "doc_id", "lang", ts.fingerprint_col(F.col("text")).alias("fp")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    exact_kept = (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang")
    )
    exact_docs = survivors.join(exact_kept.select("doc_id"), "doc_id")
    n_exact = exact_docs.count()

    # -- 4: LSH near-dup with skew diagnostics ---------------------------
    sigs = dedup.minhash_signatures(exact_docs)
    bands = dedup.lsh_bands_df(sigs).cache()
    sizes = dedup.lsh_bucket_sizes(bands)
    skew = sizes.agg(
        F.max("bucket_n").alias("max_bucket_n"),
        F.sum(
            F.when(F.col("bucket_n") > dedup.MAX_BUCKET, 1).otherwise(0)
        ).alias("n_capped_buckets"),
    ).collect()[0]
    pairs = dedup.lsh_candidate_pairs(bands)
    sh = exact_docs.select(
        "doc_id", dedup.shingles_col(F.col("text")).alias("sh")
    ).cache()
    vpairs = (
        pairs.join(
            sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1")), "id1"
        )
        .join(
            sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("sh2")), "id2"
        )
        .filter(dedup.jaccard_col(F.col("sh1"), F.col("sh2")) >= args.jaccard)
        .select("id1", "id2")
    )
    if args.closure:
        # edges accumulate across families; one closure after stage 4b
        edge_sets = [vpairs]
        deduped = exact_kept
        n_deduped = None
    else:
        near_dups = vpairs.select(F.col("id2").alias("doc_id")).distinct()
        deduped = exact_kept.join(near_dups, "doc_id", "left_anti")
        n_deduped = deduped.count()

    # -- 4b: embedding near-dup (corpus-scale ANN self-join) -------------
    emb_report = None
    if args.embeddings:
        from pero_ocr_api_spark.operators import similarity

        emb = spark.read.parquet(args.embeddings).select("vec_id", "embedding")
        # one-row metadata probe for the vector width (not a data path)
        dim = emb.select(F.size("embedding").alias("d")).first()["d"]
        surv_emb = emb.join(
            deduped.select(F.col("doc_id").alias("vec_id")), "vec_id"
        )
        bands_holder: list = []
        emb_pairs = similarity.ann_self_pairs(
            surv_emb, args.cosine, dim, bands_out=bands_holder
        )
        if args.closure:
            edge_sets.append(emb_pairs.select("id1", "id2"))
            n_deduped_emb = None
        else:
            emb_dups = emb_pairs.select(F.col("id2").alias("doc_id")).distinct()
            deduped = deduped.join(emb_dups, "doc_id", "left_anti")
            n_deduped_emb = deduped.count()
        # same skew metrics as the text LSH: the bands are already
        # cached by ann_self_pairs, so this is one cheap aggregate
        eskew = dedup.lsh_bucket_sizes(bands_holder[0], id_col="vec_id").agg(
            F.max("bucket_n").alias("max_bucket_n"),
            F.sum(
                F.when(F.col("bucket_n") > dedup.MAX_BUCKET, 1).otherwise(0)
            ).alias("n_capped_buckets"),
        ).collect()[0]
        emb_report = {
            "after_embedding_dedup": n_deduped_emb,
            "skew": {
                "max_bucket_n": eskew["max_bucket_n"],
                "n_capped_buckets": int(eskew["n_capped_buckets"] or 0),
                "cap": dedup.MAX_BUCKET,
            },
        }

    # -- 4c (--closure): one transitive closure over every pair family ---
    closure_report = None
    if args.closure:
        edges = edge_sets[0]
        for e in edge_sets[1:]:
            edges = edges.unionByName(e)
        cc_skew: dict = {}
        comps = dedup.connected_components(edges, report_out=cc_skew)
        drops = comps.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        deduped = exact_kept.join(drops, "doc_id", "left_anti")
        n_deduped = deduped.count()
        closure_report = {
            "n_dup_components": comps.select("component").distinct().count(),
            "families": 1 + (1 if args.embeddings else 0),
            # convergence/skew telemetry: a long tail = high-diameter
            # chain, a huge round 1 = one dense mega-component
            "skew": cc_skew,
        }

    # -- 4d: incremental dedup vs the HISTORICAL corpus indexes ----------
    # (the daily-ingest shape: the corpus was hashed ONCE at index-build
    # time — jobs/build_dedup_index.py — and only the batch is hashed
    # here; verification is candidates-only on both sides. Batch docs
    # matching the corpus are dropped unconditionally: history wins.)
    incr_report: dict = {}
    if args.band_index:
        from pero_ocr_api_spark.plans.io import band_index_candidates

        batch_docs = docs.join(deduped.select("doc_id"), "doc_id").select(
            "doc_id", "text"
        )
        cand = band_index_candidates(
            spark, batch_docs, args.band_index
        ).cache()
        n_cand = cand.count()
        sh_b = batch_docs.join(
            cand.select(F.col("batch_id").alias("doc_id")).distinct(),
            "doc_id",
        ).select(
            F.col("doc_id").alias("batch_id"),
            dedup.shingles_col(F.col("text")).alias("shb"),
        )
        corpus_texts = spark.read.parquet(args.corpus).select(
            F.col("doc_id").alias("_raw_id"),
            F.col("doc_id").cast("long").alias("corpus_id"),
            F.col("text").alias("corpus_text"),
        )
        # fail-loud guard (round-5 advice): a non-numeric corpus doc_id
        # casts to NULL, the sh_c join silently empties, and every
        # band-index candidate would "fail verification" — incremental
        # dedup becoming a no-op with no error. One narrow-column scan.
        n_uncastable = corpus_texts.filter(
            F.col("corpus_id").isNull() & F.col("_raw_id").isNotNull()
        ).count()
        if n_uncastable:
            raise ValueError(
                f"--corpus doc_id has {n_uncastable} values that do not "
                "cast to long; the band index keys corpus ids as long, so "
                "these rows would be dropped from verification silently"
            )
        corpus_texts = corpus_texts.drop("_raw_id")
        sh_c = corpus_texts.join(
            cand.select("corpus_id").distinct(), "corpus_id"
        ).select(
            "corpus_id",
            dedup.shingles_col(F.col("corpus_text")).alias("shc"),
        )
        drops = (
            cand.join(sh_b, "batch_id")
            .join(sh_c, "corpus_id")
            .filter(
                dedup.jaccard_col(F.col("shb"), F.col("shc"))
                >= args.jaccard
            )
            .select(F.col("batch_id").alias("doc_id"))
            .distinct()
        )
        deduped = deduped.join(drops, "doc_id", "left_anti")
        n_after = deduped.count()
        cand.unpersist()
        incr_report["incremental_text"] = {
            "candidates": n_cand,
            "after_incremental_text_dedup": n_after,
        }
    if args.embedding_index:
        from pero_ocr_api_spark.operators import similarity
        from pero_ocr_api_spark.plans.io import embedding_index_candidates

        b_raw = (
            spark.read.parquet(args.embeddings)
            .select("vec_id", "embedding")
            .join(deduped.select(F.col("doc_id").alias("vec_id")), "vec_id")
        )
        dim = b_raw.select(F.size("embedding").alias("d")).first()
        if dim is not None:  # empty batch: nothing to dedup
            cand = embedding_index_candidates(
                spark, b_raw, args.embedding_index, dim["d"]
            ).cache()
            n_cand = cand.count()
            b_emb = similarity._with_norm(b_raw).select(
                F.col("vec_id").alias("batch_id"),
                F.col("v").alias("bv"),
                F.col("norm").alias("bn"),
            )
            c_emb = similarity._with_norm(
                spark.read.parquet(args.corpus_embeddings).select(
                    "vec_id", "embedding"
                )
            ).select(
                F.col("vec_id").alias("corpus_id"),
                F.col("v").alias("cv"),
                F.col("norm").alias("cn"),
            )
            cos = similarity.dot_col(F.col("bv"), F.col("cv")) / (
                F.col("bn") * F.col("cn")
            )
            drops = (
                cand.join(b_emb, "batch_id")
                .join(c_emb, "corpus_id")
                .filter(cos >= args.cosine)
                .select(F.col("batch_id").alias("doc_id"))
                .distinct()
            )
            deduped = deduped.join(drops, "doc_id", "left_anti")
            n_after = deduped.count()
            cand.unpersist()
            incr_report["incremental_embedding"] = {
                "candidates": n_cand,
                "after_incremental_embedding_dedup": n_after,
            }

    # -- 5: deterministic stratified mix sampling ------------------------
    if args.no_sampling:
        kept = deduped.select("doc_id")
    else:
        u = dedup.md5_int_col(
            F.concat(F.lit("sample|"), F.col("doc_id").cast("string")), 7
        )
        rate = None
        for lang, pct in SAMPLE_RATES_PCT.items():
            cond = F.col("lang") == lang
            rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
        # unlisted langs keep everything (100%): a generic ingest job
        # must never silently drop a language the mix table forgot
        rate = rate.otherwise(F.lit(100)).cast("long")
        kept = deduped.filter((u * 100) < rate * _SAMPLE_SPACE).select("doc_id")
    kept.write.mode("overwrite").parquet(args.output)
    n_kept = spark.read.parquet(args.output).count()
    if args.output_rows:
        # the bucket(doc_id)-shaped handoff: kept rows hash-clustered
        # on the key downstream jobs join/merge on
        (
            docs.join(spark.read.parquet(args.output), "doc_id")
            .repartition(spark.sparkContext.defaultParallelism, "doc_id")
            .write.mode("overwrite")
            .parquet(args.output_rows)
        )
    survivors.unpersist()
    bands.unpersist()
    sh.unpersist()
    if args.embeddings:
        from pero_ocr_api_spark.operators import similarity

        similarity.release_similarity_caches()

    funnel = {
        "input": n_input,
        "after_quality_and_repetition": n_gated,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_deduped,
        "kept": n_kept,
    }
    if lm_report is not None:
        funnel["after_lm_filter"] = lm_report["after_lm_filter"]
    if emb_report is not None and emb_report["after_embedding_dedup"] is not None:
        funnel["after_embedding_dedup"] = emb_report["after_embedding_dedup"]
    if closure_report is not None:
        funnel["closure"] = closure_report
    for fam, rep in incr_report.items():
        funnel[fam] = rep

    print(
        json.dumps(
            {
                "funnel": funnel,
                "lsh_skew": {
                    "max_bucket_n": skew["max_bucket_n"],
                    "n_capped_buckets": int(skew["n_capped_buckets"] or 0),
                    "cap": dedup.MAX_BUCKET,
                },
                **(
                    {"embedding_skew": emb_report["skew"]}
                    if emb_report is not None
                    else {}
                ),
                **(
                    {
                        "lm_filter": {
                            "cutoff_avg_lp": lm_report["cutoff_avg_lp"],
                            "tail_pct": lm_report["tail_pct"],
                        }
                    }
                    if lm_report is not None
                    else {}
                ),
                "wall_sec": round(time.monotonic() - t0, 2),
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
