#!/usr/bin/env python
"""spark-submit entry: the composed training-data pipeline over a corpus.

    spark-submit --master local[N] --py-files pkg.zip \
        tools/pipeline_job.py --docs <parquet> --out <dir> \
        [--eval-docs <parquet> | --eval-dict <dir>] \
        [--rates en=0.5,de=0.25] [--min-score 0.55] [--budget-tokens 512]

One job running the full curation chain a pretraining corpus goes
through before tokenization, each stage a declarative operator from this
package, with per-stage wall-time and row counts logged as ONE JSON line
(the metrics/lineage contract of the other job entries):

  1. curate         quality x language x exact-dedup keep-set
  2. passage-dedup  cut repeated passages (Lee et al. 2022 substring
                    dedup: spans flagged by repeated_passages, removed
                    by remove_spans; --passage-w 0 skips)
  3. pii-scrub      redact emails / IPv4 / phones in place (regex tier,
                    operators/pii; --no-pii-scrub skips) — BEFORE
                    decontamination, so eval-overlap and token budgets
                    are judged on the text actually trained on
  4. decontaminate  drop docs overlapping the eval set by trigram
                    (skipped unless --eval-docs/--eval-dict given)
  5. ppl-filter     drop the worst perplexity tail under a corpus-
                    trained bigram LM (CCNet-style; --ppl-quantile 0.95
                    keeps docs at or below the 95th-percentile ppl;
                    skipped unless given) — AFTER the text rewrites so
                    the LM scores the text actually trained on
  6. dsir-select    keep the most target-like fraction by DSIR
                    importance weight (Xie et al. 2023; hashed-ngram
                    target-vs-raw log-likelihood ratio; --dsir-target
                    <parquet> + --dsir-frac 0.5; skipped unless given)
                    — AFTER the text rewrites, BEFORE mixing, so
                    selection judges the trained text and the mixer
                    sees the selected pool
  7. sample         deterministic per-language rates — explicit
                    (--rates en=0.5,de=0.25) or temperature-derived
                    (--temperature alpha[:target], p^alpha upweighting
                    of low-resource languages); skipped unless one given
  8. pack           sequence packing into fixed token-budget chunks

Output layout under --out (each stage writes its own directory; the
LAST one in the funnel holds the surviving docs):
  kept/                 docs surviving stage 1 (curate) ONLY
  passage_deduped/      kept/ with repeated passages cut from the text
  pii_scrubbed/         previous stage with PII redacted in the text
                        (per-doc n_pii column kept for thresholding)
  flagged/              decontamination hits (id, n_hits, n_shingles, overlap_frac)
  kept_decontaminated/  previous stage minus flagged ids (when an eval set was given)
  ppl_filtered/         previous stage minus the high-perplexity tail
                        (per-doc ppl column kept for audit)
  dsir_selected/        previous stage cut to the target-like fraction
                        (per-doc logw column kept for audit)
  sampled/              the sample (when --rates/--temperature was given)
  packed/               (id, n_tokens, start_offset, chunk_id) over the survivors
  metrics.json          the same JSON line, persisted
Consumers wanting "the training set" read the LAST materialized stage
(sampled/, else dsir_selected/, else ppl_filtered/, else
kept_decontaminated/, else passage_deduped/) or just packed/.

Each stage writes parquet with mode=overwrite, so re-running the job is
idempotent. Stage inputs re-read the previous stage's parquet rather
than chaining lineage — at 100 TB each stage is its own restartable unit
(the checkpointed-build rationale), and a failed stage reruns alone.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable both via spark-submit --py-files pkg.zip and directly from a
# checkout (same convention as tools/selfcheck.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="input parquet: (doc_id, lang, text, ...)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--eval-docs", default=None, help="eval-set parquet to decontaminate against")
    ap.add_argument("--eval-dict", default=None, help="persisted write_eval_dict directory")
    ap.add_argument("--rates", default=None, help="stratified rates, e.g. en=0.5,de=0.25")
    ap.add_argument("--temperature", default=None,
                    help="temperature sampling 'alpha[:target_frac]' (e.g. 0.5:0.5), "
                         "p^alpha-weighted per-language rates; alternative to --rates")
    ap.add_argument("--min-score", type=float, default=0.55)
    ap.add_argument("--langs", default="en,de")
    ap.add_argument("--budget-tokens", type=int, default=512)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--passage-w", type=int, default=8,
                    help="repeated-passage window width in tokens; 0 skips the stage")
    ap.add_argument("--passage-min-occ", type=int, default=2)
    ap.add_argument("--no-pii-scrub", action="store_true",
                    help="skip the PII redaction stage (on by default)")
    ap.add_argument("--ppl-quantile", type=float, default=None,
                    help="drop docs above this ppl quantile under a "
                         "corpus-trained bigram LM (e.g. 0.95); skipped "
                         "unless given")
    ap.add_argument("--dsir-target", default=None,
                    help="target-corpus parquet for DSIR importance "
                         "selection; skipped unless given")
    ap.add_argument("--dsir-frac", type=float, default=0.5,
                    help="fraction of docs to keep by DSIR weight "
                         "(quantile-threshold cut; needs --dsir-target)")
    ap.add_argument("--shards", type=int, default=None,
                    help="final stage: deterministic seeded global "
                         "shuffle + round-robin deal of the surviving "
                         "docs into this many training shards "
                         "(curation.shard_assign); written partitioned "
                         "by shard, each sorted by pos_in_shard")
    ap.add_argument("--shard-seed", type=int, default=0)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()
    if args.eval_docs and args.eval_dict:
        ap.error("give at most one of --eval-docs / --eval-dict")
    if args.rates and args.temperature:
        ap.error("give at most one of --rates / --temperature")
    temp_alpha = temp_target = None
    if args.temperature:
        a, _, t = args.temperature.partition(":")
        try:
            temp_alpha = float(a)
            temp_target = float(t) if t else 0.5
        except ValueError:
            ap.error(f"--temperature expects 'alpha[:target_frac]', got {args.temperature!r}")
        if temp_alpha < 0:
            ap.error(f"--temperature alpha must be >= 0, got {temp_alpha}")
        if not 0 < temp_target <= 1:
            ap.error(f"--temperature target_frac must be in (0, 1], got {temp_target}")
    if args.ppl_quantile is not None and not 0 < args.ppl_quantile < 1:
        ap.error(f"--ppl-quantile must be in (0, 1), got {args.ppl_quantile}")
    if args.dsir_target is not None and not 0 < args.dsir_frac < 1:
        ap.error(f"--dsir-frac must be in (0, 1), got {args.dsir_frac}")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # only stop the session on exit if WE created it — when main() runs
    # in-process (tests, a bench harness) getOrCreate() returns the
    # caller's session and stopping it would kill the caller
    owns_session = SparkSession.getActiveSession() is None
    builder = (
        SparkSession.builder.appName("pipeline_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.shuffle.sort.bypassMergeThreshold", "2")
    )
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from cis555_search_engine_spark.operators.curation import curate, sample_stratified
    from cis555_search_engine_spark.operators.decontam import (
        decontaminate_against,
        eval_shingle_hashes,
        read_eval_dict,
    )
    from cis555_search_engine_spark.operators.curation import pack_sequences

    docs = spark.read.parquet(args.docs)
    n_in = docs.count()
    phases: dict[str, float] = {}
    counts: dict[str, int] = {"input": n_in}

    def mark(name: str, t0: float) -> float:
        phases[name] = round(time.perf_counter() - t0, 3)
        return time.perf_counter()

    # 1. curate -> keep-set ids, then materialize the surviving docs
    t0 = time.perf_counter()
    kept_ids = curate(
        docs, min_score=args.min_score,
        langs=tuple(x.strip() for x in args.langs.split(","))
    ).select("id")
    kept = docs.join(kept_ids.withColumnRenamed("id", "doc_id"), "doc_id", "left_semi")
    kept_path = os.path.join(args.out, "kept")
    kept.write.mode("overwrite").parquet(kept_path)
    t0 = mark("curate", t0)
    kept = spark.read.parquet(kept_path)
    counts["curated"] = kept.count()

    # 2. passage-level dedup: cut repeated spans from the surviving text
    # (BEFORE decontamination, so eval-overlap is judged on the text
    # that would actually be trained on)
    if args.passage_w:
        from cis555_search_engine_spark.operators.dedup import (
            remove_spans,
            repeated_passages,
        )

        t0 = time.perf_counter()
        spans = repeated_passages(
            kept, w=args.passage_w, min_occurrences=args.passage_min_occ
        )
        rewritten = remove_spans(kept, spans).select(
            F.col("id").alias("doc_id"), "n_tokens", "n_removed", "text"
        )
        # carry every non-text column through; the rewrite replaces text
        deduped = kept.drop("text").join(rewritten, "doc_id")
        pd_path = os.path.join(args.out, "passage_deduped")
        deduped.write.mode("overwrite").parquet(pd_path)
        t0 = mark("passage_dedup", t0)
        kept = spark.read.parquet(pd_path)
        counts["passage_tokens_removed"] = int(
            kept.agg(F.sum("n_removed")).collect()[0][0] or 0
        )
        kept = kept.drop("n_tokens", "n_removed")

    # 3. PII scrub: redact in place (pure map — one projection computes
    # the pre-redaction count AND the rewritten text, zero shuffles)
    if not args.no_pii_scrub:
        from cis555_search_engine_spark.operators.pii import scrub_text_cols

        t0 = time.perf_counter()
        clean, n_pii = scrub_text_cols("text")
        scrubbed = kept.withColumns({"text": clean, "n_pii": n_pii})
        pii_path = os.path.join(args.out, "pii_scrubbed")
        scrubbed.write.mode("overwrite").parquet(pii_path)
        t0 = mark("pii_scrub", t0)
        kept = spark.read.parquet(pii_path)
        counts["pii_redactions"] = int(
            kept.agg(F.sum("n_pii")).collect()[0][0] or 0
        )
        kept = kept.drop("n_pii")

    # 4. decontaminate: drop overlapping docs from the kept set
    ev = None
    if args.eval_dict:
        ev = read_eval_dict(spark, args.eval_dict)
    elif args.eval_docs:
        ev = eval_shingle_hashes(
            spark.read.parquet(args.eval_docs), n=args.shingle_n
        )
    if ev is not None:
        t0 = time.perf_counter()
        flagged = decontaminate_against(kept, ev, n=args.shingle_n)
        flagged_path = os.path.join(args.out, "flagged")
        flagged.write.mode("overwrite").parquet(flagged_path)
        flagged_ids = spark.read.parquet(flagged_path).select(
            F.col("id").alias("doc_id")
        )
        kept = kept.join(flagged_ids, "doc_id", "left_anti")
        kept_path = os.path.join(args.out, "kept_decontaminated")
        kept.write.mode("overwrite").parquet(kept_path)
        t0 = mark("decontaminate", t0)
        kept = spark.read.parquet(kept_path)
        counts["flagged"] = spark.read.parquet(flagged_path).count()
        counts["decontaminated"] = kept.count()

    # 5. perplexity filter: drop the worst tail under a bigram LM trained
    # on the surviving corpus itself (CCNet-style). Runs AFTER the text
    # rewrites (passage cut, PII scrub) so the LM judges the text that
    # would actually be trained on. Docs with < 2 tokens have no LM
    # evidence and are KEPT (the curate stage already gates degenerate
    # docs on its own features). The threshold is approx_percentile over
    # the ppl column — deterministic for a given input, and the per-doc
    # ppl is carried into the output for audit.
    if args.ppl_quantile is not None:
        from cis555_search_engine_spark.operators.text_analysis import lm_perplexity

        t0 = time.perf_counter()
        ppl = lm_perplexity(kept).select(
            F.col("id").alias("doc_id"), "ppl"
        )
        thr = float(
            ppl.agg(
                F.percentile_approx("ppl", args.ppl_quantile, 10000)
            ).collect()[0][0]
            or float("inf")
        )
        survived = (
            kept.join(ppl, "doc_id", "left")
            .filter(F.col("ppl").isNull() | (F.col("ppl") <= F.lit(thr)))
        )
        ppl_path = os.path.join(args.out, "ppl_filtered")
        survived.write.mode("overwrite").parquet(ppl_path)
        t0 = mark("ppl_filter", t0)
        kept = spark.read.parquet(ppl_path)
        counts["ppl_threshold"] = round(thr, 4)
        counts["ppl_kept"] = kept.count()
        kept = kept.drop("ppl")

    # 6. DSIR selection: keep the most target-like --dsir-frac of the
    # survivors by importance weight (the quantile-threshold form the
    # dsir_select docstring prescribes at scale — a fraction cut is a
    # predicate, not a top-k heap). Runs AFTER the text rewrites so the
    # weights judge the trained text, BEFORE mixing so the sampler sees
    # the selected pool. Docs with no weight (< 1 token: no feature
    # evidence) are KEPT, the ppl-filter convention.
    if args.dsir_target is not None:
        from cis555_search_engine_spark.operators.curation import dsir_weights

        t0 = time.perf_counter()
        w = dsir_weights(
            kept, spark.read.parquet(args.dsir_target)
        ).select(F.col("id").alias("doc_id"), "logw")
        # keep the TOP dsir_frac => threshold at the (1 - frac) quantile
        thr = float(
            w.agg(
                F.percentile_approx("logw", 1.0 - args.dsir_frac, 10000)
            ).collect()[0][0]
            or float("-inf")
        )
        selected = (
            kept.join(w, "doc_id", "left")
            .filter(F.col("logw").isNull() | (F.col("logw") >= F.lit(thr)))
        )
        dsir_path = os.path.join(args.out, "dsir_selected")
        selected.write.mode("overwrite").parquet(dsir_path)
        t0 = mark("dsir_select", t0)
        kept = spark.read.parquet(dsir_path)
        counts["dsir_threshold"] = round(thr, 4)
        counts["dsir_kept"] = kept.count()
        kept = kept.drop("logw")

    # 7. sample (stratified explicit rates, or temperature-derived ones)
    if args.rates or args.temperature:
        t0 = time.perf_counter()
        if args.rates:
            rates = {
                k.strip(): float(v)
                for k, v in (kv.split("=") for kv in args.rates.split(","))
            }
            kept = sample_stratified(kept, rates, stratum_col="lang")
        else:
            from cis555_search_engine_spark.operators.curation import (
                sample_temperature,
            )

            kept = sample_temperature(
                kept, alpha=temp_alpha, target_frac=temp_target, stratum_col="lang"
            )
        kept_path = os.path.join(args.out, "sampled")
        kept.write.mode("overwrite").parquet(kept_path)
        t0 = mark("sample", t0)
        kept = spark.read.parquet(kept_path)
        counts["sampled"] = kept.count()

    # 8. sequence packing over the survivors
    t0 = time.perf_counter()
    packed = pack_sequences(kept, budget_tokens=args.budget_tokens)
    packed.write.mode("overwrite").parquet(os.path.join(args.out, "packed"))
    mark("pack", t0)
    pk = spark.read.parquet(os.path.join(args.out, "packed"))
    counts["packed_docs"] = pk.count()
    counts["chunks"] = pk.select("chunk_id").distinct().count()

    # 9. optional: shard the survivors for training ingestion
    if args.shards:
        from cis555_search_engine_spark.operators.curation import shard_assign

        t0 = time.perf_counter()
        assign = shard_assign(kept, n_shards=args.shards, seed=args.shard_seed)
        sharded = kept.join(assign.select("id", "shard", "pos_in_shard"),
                            kept["doc_id"] == assign["id"]).drop("id")
        (
            sharded.repartition(args.shards, "shard")
            .sortWithinPartitions("pos_in_shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(os.path.join(args.out, "shards"))
        )
        mark("shard", t0)
        counts["shards"] = args.shards

    total = round(sum(phases.values()), 3)
    line = {
        "metric": "pipeline_docs/sec",
        "value": round(n_in / total, 1) if total else None,
        "unit": "docs/sec",
        "phases": phases,
        "counts": counts,
        "total_s": total,
    }
    # filesystem-agnostic persist: every data stage writes --out through
    # Spark writers, so a local open() here would crash (or mis-place
    # the file) for s3a://... / hdfs://... outputs (ADVICE r4)
    from cis555_search_engine_spark import fsio

    fsio.write_text_atomic(spark, f"{args.out}/metrics.json", json.dumps(line))
    print(json.dumps(line))
    sys.stdout.flush()
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
