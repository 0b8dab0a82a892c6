"""JDBC incremental source end-to-end over Apache Derby embedded (ships in
Spark's jars — a real JDBC engine in-process, no network): closes the r2
verdict's 'JDBC sources are plan-only' gap. Covers QueryDatabaseTable's
max-value poll loop (full first scan → watermark → only-new rows → empty
re-poll) and GenerateTableFetch's partitioned fetch."""

from pyspark.sql import functions as F

from nifi_spark.sources.jdbc_incremental import (
    MaxValueState,
    commit_watermark,
    read_incremental,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _write(df, url, mode):
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "events")
        .option("driver", DRIVER)
        .mode(mode)
        .save()
    )


def test_jdbc_incremental_poll_end_to_end(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    state = MaxValueState(str(tmp_path / "state.json"))

    _write(
        spark.range(1, 11).select(
            F.col("id").alias("SEQ"), (F.col("id") * 2.0).alias("VAL")
        ),
        url, "overwrite",
    )

    # poll 1: no watermark -> full scan
    df1 = read_incremental(spark, url, "events", "SEQ", state, driver=DRIVER)
    got1 = sorted(r.SEQ for r in df1.collect())
    assert got1 == list(range(1, 11))
    commit_watermark(max(got1), state, "events", "SEQ")

    # poll 2 with no new rows -> empty (watermark held)
    assert read_incremental(spark, url, "events", "SEQ", state, driver=DRIVER).count() == 0

    # new rows arrive; poll 3 returns ONLY them
    _write(
        spark.range(11, 16).select(
            F.col("id").alias("SEQ"), (F.col("id") * 2.0).alias("VAL")
        ),
        url, "append",
    )
    df3 = read_incremental(spark, url, "events", "SEQ", state, driver=DRIVER)
    got3 = sorted(r.SEQ for r in df3.collect())
    assert got3 == list(range(11, 16))

    # failed downstream => watermark NOT advanced => re-poll sees same rows
    df3b = read_incremental(spark, url, "events", "SEQ", state, driver=DRIVER)
    assert sorted(r.SEQ for r in df3b.collect()) == got3
    commit_watermark(max(got3), state, "events", "SEQ")
    assert read_incremental(spark, url, "events", "SEQ", state, driver=DRIVER).count() == 0


def test_jdbc_partitioned_fetch(spark, tmp_path):
    """GenerateTableFetch ≙ Spark's partitioned JDBC read: same rows,
    parallel page scans."""
    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    state = MaxValueState(str(tmp_path / "state2.json"))
    _write(
        spark.range(1, 101).select(
            F.col("id").alias("SEQ"), (F.col("id") % 7.0).alias("VAL")
        ),
        url, "overwrite",
    )
    df = read_incremental(
        spark, url, "events", "SEQ", state,
        partition_column="SEQ", num_partitions=4, lower_bound=1, upper_bound=101,
        driver=DRIVER,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert df.agg(F.sum("SEQ")).collect()[0][0] == 5050
