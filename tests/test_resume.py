"""Resume/checkpoint idempotence (north rule; SURVEY §4.2, §5 item e).

Run → crash-after-half → rerun must converge to the same result set with no
duplicates, and the rerun must actually skip completed urls (anti-join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_project_spark.operators.resume import completed_urls, resume_filter
from ocr_project_spark.pipeline import run_extraction, run_job


def test_latest_capture_keeps_newest(spark, pages):
    from ocr_project_spark.operators.resume import latest_capture

    recrawl = pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1000 SECONDS")
    )
    corpus = pages.unionByName(recrawl)
    kept = latest_capture(corpus)
    assert kept.count() == pages.count()
    # every kept row is the shifted (newer) capture
    newest = {r["url"]: r["warc_ts"] for r in recrawl.select("url", "warc_ts").collect()}
    got = {r["url"]: r["warc_ts"] for r in kept.select("url", "warc_ts").collect()}
    assert got == newest


def test_resume_filter_skips_done(spark, pages):
    done = pages.select("url").limit(100)
    todo = resume_filter(pages, done)
    assert todo.count() == pages.count() - 100
    assert todo.join(done, "url", "left_semi").count() == 0


def test_resume_filter_cold_start(pages):
    assert resume_filter(pages, None) is pages


def test_completed_urls_missing_dir(spark, tmp_path):
    assert completed_urls(spark, str(tmp_path / "nope")) is None


def test_crash_and_rerun_converges(spark, pages, tmp_path):
    results_path = str(tmp_path / "results")
    full = run_extraction(pages, repartition=False)

    # simulated crash: only half the urls were written in run #1
    partial = full.where(F.xxhash64("url") % 2 == 0)
    partial.write.mode("append").parquet(results_path)
    n_partial = spark.read.parquet(results_path).count()
    assert 0 < n_partial < pages.count()

    # run #2 resumes from the checkpoint
    run_job(spark, pages, results_path)
    final = spark.read.parquet(results_path)
    assert final.count() == pages.count()
    # exactly-once: no url appears twice
    assert final.groupBy("url").count().where(F.col("count") > 1).count() == 0
    # and the recovered rows are identical to a clean full run
    clean = {r["url"]: r["text"] for r in full.select("url", "text").collect()}
    resumed = {r["url"]: r["text"] for r in final.select("url", "text").collect()}
    assert resumed == clean


def test_rerun_after_completion_is_noop(spark, pages, tmp_path):
    results_path = str(tmp_path / "results")
    run_job(spark, pages, results_path)
    n1 = spark.read.parquet(results_path).count()
    run_job(spark, pages, results_path)  # everything already done
    assert spark.read.parquet(results_path).count() == n1


def test_latest_capture_equal_ts_tiebreak_deterministic(spark):
    """Equal-timestamp captures with different payloads keep a
    data-determined winner (md5 desc), stable across runs and input order."""
    import hashlib
    from datetime import datetime

    from ocr_project_spark.operators.resume import latest_capture

    ts = datetime(2025, 1, 1, 12, 0, 0)
    payloads = [b"<html>capture-a</html>", b"<html>capture-b</html>"]
    expected = max(payloads, key=lambda p: hashlib.md5(p).hexdigest())
    rows = [("https://x.example.org/p", ts, p) for p in payloads]
    for ordering in (rows, rows[::-1]):
        df = spark.createDataFrame(
            ordering, "url string, warc_ts timestamp, html binary"
        ).repartition(4)
        out = latest_capture(df).collect()
        assert len(out) == 1
        assert bytes(out[0]["html"]) == expected


def test_crawl_delta_all_statuses(spark):
    from ocr_project_spark.operators.resume import crawl_delta

    old = spark.createDataFrame(
        [
            ("u/same", bytearray(b"alpha")),
            ("u/mod", bytearray(b"beta")),
            ("u/dead", bytearray(b"gamma")),
            ("u/null", None),
        ],
        "url string, html binary",
    )
    new = spark.createDataFrame(
        [
            ("u/same", bytearray(b"alpha")),
            ("u/mod", bytearray(b"beta2")),
            ("u/new", bytearray(b"delta")),
            ("u/null", None),
        ],
        "url string, html binary",
    )
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {
        "u/same": "unchanged",
        "u/mod": "changed",
        "u/dead": "gone",
        "u/new": "added",
        # NULL payloads count as present; NULL == NULL is unchanged
        "u/null": "unchanged",
    }


def test_crawl_delta_null_payload_transitions(spark):
    from ocr_project_spark.operators.resume import crawl_delta

    old = spark.createDataFrame(
        [("u/a", None), ("u/b", bytearray(b"x"))], "url string, html binary"
    )
    new = spark.createDataFrame(
        [("u/a", bytearray(b"x")), ("u/b", None)], "url string, html binary"
    )
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {"u/a": "changed", "u/b": "changed"}


def test_run_job_bucketed_crash_rerun_noop(spark, pages, tmp_path):
    """run_job(bucketed_table=...) — verdict item 8: the PLANS §2b bucketed
    checkpoint as a first-class run_job store. Crash/rerun converges to one
    row per url (same suite as the plain-parquet store), a completed rerun
    is a noop, lineage run_ids stay monotone, and the resume anti-join's
    done side reads the bucketed table with NO exchange."""
    from ocr_project_spark.operators.resume import completed_urls_bucketed

    table = "test_run_job_bucketed"
    lineage_path = str(tmp_path / "lineage")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        # run #1 "crashes" after covering an arbitrary half of the urls
        run_job(
            spark,
            pages.where(F.xxhash64("url") % 2 == 0),
            None,
            lineage_path,
            bucketed_table=table,
            buckets=8,
        )
        n_partial = spark.table(table).count()
        assert 0 < n_partial < pages.count()

        # run #2 resumes: only the missing urls extract, result converges
        run_job(spark, pages, None, lineage_path, bucketed_table=table, buckets=8)
        final = spark.table(table)
        assert final.count() == pages.count()
        assert final.groupBy("url").count().where(F.col("count") > 1).count() == 0
        # both runs' appends carry their own run_id
        assert {r[0] for r in final.select("run_id").distinct().collect()} == {0, 1}
        assert spark.read.parquet(lineage_path).select("run_id").distinct().count() == 2

        # run #3 is a noop (no new results rows, lineage may append an empty run)
        run_job(spark, pages, None, lineage_path, bucketed_table=table, buckets=8)
        assert spark.table(table).count() == pages.count()

        # recovered text identical to a clean full run (byte-identity holds
        # across the store switch)
        clean = {
            r["url"]: r["text"]
            for r in run_extraction(pages, repartition=False)
            .select("url", "text")
            .collect()
        }
        resumed = {r["url"]: r["text"] for r in final.select("url", "text").collect()}
        assert resumed == clean

        # the done side of the resume anti-join is exchange-free: only the
        # incoming pages side shuffles (the PLANS §2b contract)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            todo = resume_filter(pages, completed_urls_bucketed(spark, table))
            plan = todo._sc._jvm.PythonSQLUtils.explainString(
                todo._jdf.queryExecution(), "formatted"
            )
            assert "LeftAnti" in plan
            import re

            n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
            assert n_exchange == 1, plan
            assert "Bucketed: true" in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
