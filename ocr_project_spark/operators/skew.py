"""Url-hash bucketing with salted repartitioning (north rule; SURVEY §4.1).

At 10^12 documents, host-level skew is the dominant hazard: one hot domain
can hold millions of pages. Urls themselves are unique, so a plain
``xxhash64(url)`` bucket already spreads rows uniformly; the salt matters
when downstream stages group by host (politeness, per-host stats) or when a
bucket count far below the host count would alias hot hosts together.

Strategy (plain DataFrame code — no planner hooks, SURVEY §4):
1. a lightweight ``groupBy(host).count()`` pre-pass finds hot hosts (an
   aggregation over a single string column — cheap, benefits from partial
   aggregation and column pruning);
2. rows from hot hosts get a deterministic per-url salt, others salt 0;
3. ``repartition(n, bucket, salt)`` co-locates cold hosts (cache-friendly)
   while shattering hot hosts across ``salt_buckets`` partitions.

AQE (``spark.sql.adaptive.enabled`` + skewJoin) remains on as the runtime
backstop; this pre-pass bounds the static plan before AQE ever sees it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_HOT_THRESHOLD = 0.01  # a host holding >1% of all rows is "hot"


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "host", F.parse_url(F.col(url_col), F.lit("HOST"))
    )


def hot_hosts(
    df: DataFrame, url_col: str = "url", threshold: float = DEFAULT_HOT_THRESHOLD
) -> DataFrame:
    """Hosts whose row share exceeds ``threshold`` — a small aggregate meant
    to be collected/broadcast (bounded by the number of distinct hot domains,
    which is tiny by construction of the threshold)."""
    with_h = with_host(df, url_col)
    total = with_h.count()
    return (
        with_h.groupBy("host")
        .count()
        .where(F.col("count") > threshold * total)
        .select("host")
    )


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    url_col: str = "url",
    salt_buckets: int = 16,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Repartition by (url-hash bucket, salt): deterministic, shuffle-once.

    ``hot`` is the hot-host DataFrame from :func:`hot_hosts`; when omitted it
    is computed in-line. The salt is ``xxhash64(url) % salt_buckets`` for hot
    hosts and 0 otherwise, so re-runs place every url in the same partition
    (required for resume determinism).
    """
    if hot is None:
        hot = hot_hosts(df, url_col)
    with_h = with_host(df, url_col)
    marked = with_h.join(
        F.broadcast(hot.withColumn("__is_hot", F.lit(True))), "host", "left"
    )
    salted = marked.withColumn(
        "__salt",
        F.when(
            F.col("__is_hot").isNotNull(),
            F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets)),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col("host")), F.lit(num_partitions))
    )
    out = salted.repartition(num_partitions, F.col("__bucket"), F.col("__salt"))
    return out.drop("__salt", "__bucket", "__is_hot", "host")
