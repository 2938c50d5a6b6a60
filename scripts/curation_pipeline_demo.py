#!/usr/bin/env python
"""End-to-end training-data curation pipeline demo: the individual
operators composed the way a production corpus build chains them.

    rule filter → exact dedup → boilerplate chunk removal →
    near-dup (MinHash-LSH) cluster drop → eval decontamination →
    DSIR domain selection → temperature mix rebalance →
    PII redaction → tokenizer learn/persist/drift-gate →
    real-token accounting → chunk/pack accounting

Each stage is the same operator the query catalog exposes (q57, q30,
q111, q31/q49, q51, q112, q59, redact, q115-q120, q39) — this script
demonstrates that they compose lazily into ONE Spark job graph per
action, not separate pipelines.

Usage: python scripts/curation_pipeline_demo.py [sf_dir]
Prints one JSON line of per-stage survivor counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "UTC")
time.tzset()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    from defenda_data_lake_spark.operators import dedup as D
    from defenda_data_lake_spark.operators import sampling as SA
    from defenda_data_lake_spark.operators import text as X
    from defenda_data_lake_spark.session import get_spark

    spark = get_spark(app_name="curation-demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts: dict[str, int] = {"input": docs.count()}

    # 1. rule-based quality filter (shuffle-free projection)
    kept = X.gopher_quality_flags(docs).filter(F.col("keep") == 1)
    kept = kept.select("doc_id", "text", "source", "lang")
    counts["rule_filter"] = kept.count()

    # 2. exact dedup: keep the min-id representative per content hash
    kept = D.exact_dedup(kept, "text", "doc_id")
    counts["exact_dedup"] = kept.count()

    # 2b. boilerplate removal (C4 rule): chunks appearing in >= 2
    # distinct docs are cut from EVERY doc; documents continue with
    # their cleaned text (q111's operator)
    cleaned = D.boilerplate_chunk_removal(
        kept, "text", "doc_id", chunk_words=20, min_doc_freq=2
    ).select(F.col("id").alias("doc_id"), F.col("clean_text"), "n_boiler")
    # ONE action for both stage stats — a second .agg on the unpinned
    # plan would re-run the whole chunk doc-frequency aggregation
    stats_row = cleaned.agg(
        F.sum("n_boiler").alias("cut"),
        F.sum((F.length("clean_text") > 0).cast("long")).alias("kept"),
    ).first()
    counts["boiler_chunks_cut"] = int(stats_row["cut"] or 0)
    counts["boilerplate_removed"] = int(stats_row["kept"] or 0)
    kept = (
        kept.join(cleaned, "doc_id")
        .withColumn("text", F.col("clean_text"))
        .drop("clean_text", "n_boiler")
        .filter(F.length("text") > 0)  # fully-boilerplate docs drop out
    )

    # 3. near-dup removal: MinHash-LSH pairs → clusters → keep canonical
    pairs = D.minhash_lsh_candidates(kept, "text", "doc_id")
    clusters = D.duplicate_clusters(kept, pairs)
    canonical = clusters.filter(F.col("is_canonical") == 1).select("doc_id")
    # persist the expensive prefix (LSH + iterative components) so the
    # downstream stage counts don't re-run it per action
    kept = kept.join(canonical, "doc_id").persist()
    counts["near_dedup"] = kept.count()

    # 4. eval decontamination: drop docs overlapping the held-out split
    tagged = SA.with_split(kept, "doc_id", test_fraction=0.1)
    train = tagged.filter(F.col("split") == "train")
    test = tagged.filter(F.col("split") == "test")
    contaminated = (
        D.ngram_contamination(train, test, "text", "doc_id", n=8)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct()
    )
    kept = train.join(contaminated, "doc_id", "left_anti")
    counts["decontaminated"] = kept.count()

    # 4a. SEMANTIC decontamination (q122's operator): the n-gram pass
    # above misses paraphrased eval leakage — flag survivors whose
    # EMBEDDING sits within cosine 0.35 of any held-out item (doc_id
    # aligns with vec_id in the synthetic corpus) and drop those too
    from defenda_data_lake_spark.operators.similarity import (
        semantic_contamination,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    test_ids = test.select(F.col("doc_id").alias("vec_id"))
    kept_ids = kept.select(F.col("doc_id").alias("vec_id"))
    sem_flagged = semantic_contamination(
        emb.join(kept_ids, "vec_id"), emb.join(test_ids, "vec_id"), 0.35
    ).select(F.col("vec_id").alias("doc_id"))
    # persist: the count below plus the DSIR stage's two actions would
    # otherwise re-run the embedding kernel + joins (stage-3 convention)
    kept = kept.join(sem_flagged, "doc_id", "left_anti").persist()
    counts["sem_decontaminated"] = kept.count()

    # 4b. DSIR domain matching: score every survivor against the
    # English-target hashed-ngram model (q112's operator) and keep the
    # top ~80% by importance weight — the "make the crawl look like
    # the target domain" selection step
    weights = SA.dsir_importance_weights(kept, F.col("lang") == "en").persist()
    cutoff = weights.agg(
        F.expr("percentile_approx(avg_logw, 0.2)").alias("c")
    ).first()["c"]
    if cutoff is not None:  # empty survivor set: nothing to threshold
        kept = kept.join(
            weights.filter(F.col("avg_logw") >= cutoff).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
        )
    # pin the post-selection corpus: every later stage count would
    # otherwise re-run the DSIR scoring join and the decontamination
    # anti-join (the stage-3 persist convention)
    kept = kept.persist()
    counts["dsir_selected"] = kept.count()

    # 5. temperature mix rebalance (α=0.5 toward a flatter source mix)
    kept = SA.temperature_resample(kept, "doc_id", "source").filter(
        F.col("keep") == 1
    )
    counts["rebalanced"] = kept.count()

    # 5b. token-budget mix spec: cap each source at 90% of its post-
    # rebalance tokens, most lexically diverse documents first — the
    # step that turns a ranked corpus into a mix of a target size
    # (group_token_budget_select; its ungrouped twin takes one global
    # budget)
    toks = X.token_count_col("text")
    uniq = F.size(F.array_distinct(F.split(F.trim(F.col("text")), " ")))
    scored = kept.withColumn("_n_tok", toks.cast("long")).withColumn(
        "_mix_score", uniq.cast("double") / toks.cast("double")
    )
    kept = SA.group_token_budget_select(
        scored,
        token_col="_n_tok",
        key_col="_mix_score",
        group_col="source",
        tie_cols=["doc_id"],
        budget_ratio=(9, 10),
    ).drop("_n_tok", "_mix_score", "cum_tokens")
    counts["mix_budget"] = kept.count()

    # 6. PII redaction (projection — rows unchanged by construction, so
    # no separate count action).  Persist here: the tokenizer stage,
    # the two packing accountants, and the export each act on this
    # corpus, and the unpinned lineage would re-run the rebalance/
    # mix-budget/redaction suffix per action (the stage-3 convention)
    kept = X.redact(kept, "text").persist()

    # 6b. tokenizer lifecycle: learn the BPE merge table on the CURATED
    # corpus, persist it, and gate adoption with a drift report against
    # a table learned on the RAW input — the check a production
    # pipeline runs before committing to retokenizing everything
    import tempfile

    from defenda_data_lake_spark.operators import bpe as B

    curated_for_bpe = kept.select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    merges_curated = B.learn_bpe_spark(curated_for_bpe)
    merges_raw = B.learn_bpe_spark(docs)
    model_dir = os.path.join(tempfile.mkdtemp(prefix="curation_bpe_"), "model")
    B.save_bpe_model(spark, merges_curated, model_dir)
    reloaded = B.load_bpe_model(spark, model_dir)
    assert reloaded == merges_curated  # learn-once/apply-everywhere
    drift = B.bpe_drift(merges_raw, merges_curated)
    counts["vocab_drifted_by_curation"] = int(drift["drifted"])
    counts["vocab_token_jaccard"] = round(drift["token_jaccard"], 4)
    counts["vocab_added"] = len(drift["added"])
    counts["vocab_removed"] = len(drift["removed"])
    counts["bpe_model_dir"] = model_dir

    # 6c. the nightly auto-relearn policy against the persisted model:
    # an unchanged corpus must be a no-op (keep-identical), and the
    # drifted RAW corpus gets a dry-run policy verdict — adoption only
    # on measured fertility gain, never on churn alone
    refresh_same = B.tokenizer_refresh(spark, curated_for_bpe, model_dir)
    assert refresh_same["decision"] == "keep-identical"
    counts["tokenizer_refresh_unchanged"] = refresh_same["decision"]
    refresh_raw = B.tokenizer_refresh(spark, docs, model_dir, dry_run=True)
    counts["tokenizer_refresh_raw_dryrun"] = refresh_raw["decision"]
    if refresh_raw["relative_gain"] is not None:
        counts["tokenizer_refresh_raw_gain"] = round(
            refresh_raw["relative_gain"], 6
        )

    # 7. packing accounting, twice: whitespace-proxy 256-token bins
    # (the historical metric) and REAL learned tokens with byte
    # fallback in 512-token bins — the number a training run budgets
    total_tokens = kept.agg(
        F.sum(X.token_count_col("text_redacted")).alias("t")
    ).first()["t"] or 0
    counts["total_tokens"] = int(total_tokens)
    counts["bins_256"] = int((total_tokens + 255) // 256)
    bpe_total = B.full_token_accounting(curated_for_bpe, merges_curated).agg(
        F.sum("n_tokens_total").alias("t")
    ).first()["t"] or 0
    counts["bpe_tokens_total"] = int(bpe_total)
    counts["bpe_bins_512"] = int((bpe_total + 511) // 512)

    # 8. materialize the curated corpus as deterministic training
    # shards (hash membership + pseudo-shuffled order + manifest)
    from defenda_data_lake_spark.operators.export import export_jsonl_shards

    # argv[2] keeps the shards; the default temp dir is printed so the
    # output is findable, and repeated demo runs don't silently pile up
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(tempfile.mkdtemp(prefix="curation_"), "shards")
    )
    manifest = export_jsonl_shards(
        kept.select("doc_id", "text_redacted", "source"),
        out_dir,
        "doc_id",
        n_shards=4,
        order="hash",
    )
    counts["exported_rows"] = manifest["total_rows"]
    counts["export_shards"] = manifest["n_shards"]
    counts["export_dir"] = out_dir

    print(json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
