"""Plan-contract tests: the physical-plan properties PLANS.md documents,
asserted so a regression (lost pushdown, an extra shuffle, a dropped
broadcast) fails the suite instead of silently shipping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    """Formatted physical plan of a DataFrame (what .explain prints)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def n_nodes(plan: str, op: str) -> int:
    """Count physical operators by their detail headers ('(2) Exchange'),
    not raw substrings (each node appears twice in formatted output)."""
    return sum(
        1
        for ln in plan.splitlines()
        if ln.startswith("(") and ln.split(") ", 1)[-1].strip() == op
    )


@pytest.fixture(scope="module")
def results_path(spark, pages, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "results")
    from ocr_project_spark.pipeline import run_extraction

    run_extraction(pages, repartition=False).write.parquet(path)
    return path


def test_extraction_has_single_shuffle_and_pruned_scan(spark, tmp_path_factory):
    """SURVEY §3.1 / PLANS §3: scan pruned to the 4 extraction columns, ONE
    url-hash exchange, narrow MapInPandas, parity fields as a projection."""
    from ocr_project_spark.pipeline import run_extraction

    path = str(tmp_path_factory.mktemp("plans") / "pages")
    from ocr_project_spark.datagen import synthesize_pages

    synthesize_pages(spark, "/root/testdata/sf0.001").write.parquet(path)
    plan = plan_of(run_extraction(spark.read.parquet(path), num_partitions=8))
    assert n_nodes(plan, "Exchange") == 1  # only the url-hash repartition
    assert "xxhash64(url" in plan
    # column pruning reached the scan: none of the pruned columns are read
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for col in ("url", "html", "doc_id", "backend"):
        assert col in read_schema
    for col in ("warc_ts", "text:", "lang"):
        assert col not in read_schema
    # round-2 parity fields are a JVM projection above the Python stage
    assert "MapInPandas" in plan and "Project" in plan


def test_resume_antijoin_reads_only_url(spark, pages, results_path):
    """PLANS §2: the done-side scan of the resume anti-join is pruned to the
    url column — the checkpoint payloads are never read."""
    from ocr_project_spark.operators.resume import completed_urls, resume_filter

    done = completed_urls(spark, results_path)
    plan = plan_of(resume_filter(pages, done))
    read_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    done_side = [ln for ln in read_schemas if "url" in ln]
    assert done_side and all("markdown" not in ln for ln in read_schemas)
    assert "LeftAnti" in plan


def test_flagship_rollup_broadcasts_dim_and_partial_aggs(spark):
    """PLANS §4: dimension side broadcast (fact side never shuffles for the
    join), aggregation partial→final."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q_flagship_rollup(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert n_nodes(plan, "HashAggregate") >= 2  # partial + final


def test_brute_topk_broadcasts_queries(spark):
    """similarity: the (small) query side is broadcast — the corpus is
    scanned once with no corpus-side shuffle before scoring."""
    from ocr_project_spark.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = plan_of(brute_force_topk(emb, emb.where("vec_id < 5"), k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_exact_dedup_partial_aggregation(spark, documents):
    """dedup: md5 groupBy decomposes into partial+final HashAggregate (one
    row per distinct hash crosses the wire per partition)."""
    from ocr_project_spark.dedup import exact_dup_groups

    plan = plan_of(exact_dup_groups(documents))
    assert n_nodes(plan, "HashAggregate") >= 2


def test_filter_pushdown_reaches_parquet(spark):
    """Catalyst pushes the predicate into the parquet scan. Uses a table no
    fixture caches: a cached relation resolves to InMemoryTableScan, which
    has no pushdown surface."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = plan_of(
        orders.where(F.col("o_orderkey") < 100).select("o_orderkey", "o_custkey")
    )
    assert (
        "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]"
        in plan
    )


def test_bucketed_resume_antijoin_skips_done_side_shuffle(spark, pages):
    """Bucketing for co-located joins: with the results table bucketed on
    url, the resume anti-join shuffles ONLY the incoming pages side — the
    (at scale, enormous) checkpoint side is read pre-partitioned."""
    from ocr_project_spark.operators.resume import (
        completed_urls_bucketed,
        resume_filter,
        write_results_bucketed,
    )
    from ocr_project_spark.pipeline import run_extraction

    table = "test_results_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # model the at-scale shape: the done side is far too big to broadcast
    # (force SMJ), and the incoming pages are a fresh scan, not a cache
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        done_results = run_extraction(pages.limit(200), repartition=False)
        write_results_bucketed(done_results, table, buckets=8)
        done = completed_urls_bucketed(spark, table)
        assert done is not None
        todo = resume_filter(pages, done)
        plan = plan_of(todo)
        assert "LeftAnti" in plan
        # exactly one exchange: the pages side; the bucketed done side none
        assert n_nodes(plan, "Exchange") == 1
        assert "Bucketed: true" in plan
        # and it still computes the right answer
        assert todo.count() == pages.count() - 200
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_span_removal_no_cartesian_and_partial_aggs(spark, documents):
    """PLANS §6: span removal's only wide ops are partial-agg groupBys and
    key joins — never a cartesian product; payloads never shuffle."""
    from ocr_project_spark.dedup import remove_repeated_spans

    plan = plan_of(remove_repeated_spans(documents))
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert "partial_count" in plan or "HashAggregate" in plan


def test_token_shards_offsets_join_is_broadcast(spark, documents):
    """PLANS §6: the per-bucket offset map joins back as a tiny broadcast
    hash join, never an O(n_buckets) when-chain."""
    from ocr_project_spark.textops import shard_by_token_budget

    plan = plan_of(shard_by_token_budget(documents))
    assert n_nodes(plan, "BroadcastHashJoin") >= 1
    assert "CASE WHEN (__part" not in plan


def test_lineage_readback_prunes_to_current_run(spark, pages, tmp_path):
    """The per-run lineage pass reads ONLY the current run's rows: the
    run_id equality predicate reaches the parquet scan, so files written by
    prior runs are skipped on their row-group stats — lineage cost is
    proportional to the run, never the accumulated results table."""
    from ocr_project_spark.pipeline import run_job, this_run_results

    results_path = str(tmp_path / "results")
    lineage_path = str(tmp_path / "lineage")
    run_job(spark, pages.where("doc_id < 100"), results_path, lineage_path)
    run_job(spark, pages, results_path, lineage_path)
    rb = this_run_results(spark, results_path, 1)
    plan = plan_of(rb)
    assert "EqualTo(run_id,1)" in plan, plan
    # and the read-back rows really are just the second run's
    assert rb.count() == pages.count() - 100


def test_cap_per_host_single_host_exchange(spark):
    """cap_per_host shuffles once, on host, for the rank window."""
    from ocr_project_spark.operators.skew import cap_per_host

    rows = [(f"https://h{i % 3}.example.org/p{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "url string")
    plan = plan_of(cap_per_host(df, max_per_host=2))
    assert n_nodes(plan, "Exchange") <= 2  # round-robin source + host hash
    assert n_nodes(plan, "Window") == 1


def test_line_removal_no_cartesian_and_partial_aggs(spark, documents):
    """PLANS §8: line dedup's only wide ops are partial-agg groupBys and
    key joins — never a cartesian product; payloads never shuffle."""
    from ocr_project_spark.dedup import remove_repeated_lines

    plan = plan_of(remove_repeated_lines(documents))
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert "partial_count" in plan or "HashAggregate" in plan


def test_gram_lm_scores_bounded_exchanges(spark, documents):
    """quality_lm's inverted-df pipeline shuffles 16-byte gram rows only:
    groupBy(gram_hash) df build, the df join probe, and the per-doc rollup
    — never a cartesian product, and the text payloads never exchange."""
    from ocr_project_spark.textops import gram_lm_scores

    plan = plan_of(gram_lm_scores(documents))
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert n_nodes(plan, "Exchange") <= 4
    assert "partial_count" in plan or "HashAggregate" in plan


def test_semdedup_pairs_single_cell_exchange(spark):
    """SemDeDup's candidate join shuffles on the cell id — an equi-join,
    never a cartesian product (pinned centroids so no training job runs
    at plan-build time)."""
    import numpy as np

    from ocr_project_spark.similarity import semdedup_pairs

    rows = [(i, [float(i % 3), 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = plan_of(
        semdedup_pairs(df, threshold=0.9, centroids=np.array([[1.0, 0.0], [0.0, 1.0]]))
    )
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_nb_classifier_plan_shapes(spark, documents):
    """NB inference: the model join is a hash/merge equi-join on word, the
    only nested-loops are the tiny broadcast scaffolds (1-row vocab and
    n_train aggregates onto |labels| rows — the classes subtree appears
    twice, once under the n_train aggregate — and |labels| rows onto
    docs), and no CartesianProduct anywhere — text payloads never
    shuffle."""
    from ocr_project_spark.classify import nb_classify

    train = documents.select(F.col("lang").alias("label"), "text")
    plan = plan_of(nb_classify(train, documents))
    assert n_nodes(plan, "CartesianProduct") == 0
    assert n_nodes(plan, "BroadcastNestedLoopJoin") <= 4
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
