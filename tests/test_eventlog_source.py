"""Custom Python DataSource (sources/eventlog.py): wire-format parse,
corrupt-row capture, and per-file partition parallelism."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_challenge_spark.sources.eventlog import read_eventlog


def _write_logs(tmp_path, n_files=3, rows_per_file=4):
    rows = []
    for f in range(n_files):
        lines = []
        for i in range(rows_per_file):
            eid = f * 100 + i
            lines.append(
                f'{eid}|2024-01-0{f + 1}T0{i}:30:00|{eid % 7}'
                f'|click|{eid}.5|{{"k":{eid}}}')
            rows.append(eid)
        (tmp_path / f"part{f}.log").write_text("\n".join(lines) + "\n")
    return rows


def test_eventlog_reads_typed_rows(spark, tmp_path):
    ids = _write_logs(tmp_path)
    df = read_eventlog(spark, str(tmp_path))
    got = df.orderBy("event_id").collect()
    assert [r.event_id for r in got] == sorted(ids)
    r0 = got[0]
    assert r0.ts.isoformat() == "2024-01-01T00:30:00"
    assert r0.user_id == 0 and r0.event_type == "click"
    assert r0.value == 0.5 and r0.props == '{"k":0}'
    assert all(r._corrupt is None for r in got)


def test_eventlog_corrupt_lines_quarantined(spark, tmp_path):
    (tmp_path / "bad.log").write_text(
        "1|2024-01-01T00:00:00|3|click|1.0|{}\n"
        "not|a|valid|line\n"
        "\n"  # blank lines skipped entirely
        "2|2024-01-01T00:00:01|4|view|2.0|{}\n")
    df = read_eventlog(spark, str(tmp_path))
    ok = df.where(F.col("_corrupt").isNull())
    bad = df.where(F.col("_corrupt").isNotNull())
    assert ok.count() == 2
    assert [r._corrupt for r in bad.collect()] == ["not|a|valid|line"]


def test_eventlog_partition_per_file(spark, tmp_path):
    _write_logs(tmp_path, n_files=5)
    df = read_eventlog(spark, str(tmp_path))
    assert df.rdd.getNumPartitions() == 5


def test_eventlog_feeds_existing_rollup(spark, tmp_path):
    """The custom source composes with the engine's aggregates."""
    _write_logs(tmp_path)
    df = read_eventlog(spark, str(tmp_path))
    rollup = (df.groupBy(F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count("*").alias("n")))
    assert rollup.agg(F.sum("n")).first()[0] == 12


def test_eventlog_stream_tails_new_files(spark, tmp_path):
    """Streaming variant: a second micro-batch picks up files that
    landed after the first, and only those (offset = file count)."""
    src = tmp_path / "logs"; src.mkdir()
    _write_logs(src, n_files=2, rows_per_file=3)

    from data_ingestion_challenge_spark.sources.eventlog import (
        register_eventlog)
    register_eventlog(spark)
    df = (spark.readStream.format("eventlog")
          .option("path", str(src)).load())
    q = df.writeStream.format("memory").queryName("evlog").start()
    try:
        q.processAllAvailable()
        assert spark.sql("select count(*) n from evlog").first().n == 6
        _write_logs(src, n_files=3, rows_per_file=3)  # part2 is new
        q.processAllAvailable()
        got = spark.sql(
            "select count(*) n, count(distinct event_id) d from evlog"
        ).first()
        assert (got.n, got.d) == (9, 9)  # no re-read of old files
    finally:
        q.stop()
