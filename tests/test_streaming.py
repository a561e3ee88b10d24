"""Structured Streaming landing-dir wrapper (§2.9): availableNow
drain runs the SAME batch step per landed file; checkpoint gives
each file exactly-once; replays stay idempotent."""

from __future__ import annotations

import datetime as dt

import pytest

# internal-consistency soak: excluded from the driver-visible fast
# gate (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow

from inpe_queimadas_etl_spark import pipeline, streaming
from inpe_queimadas_etl_spark.schemas import UF_AREA
from inpe_queimadas_etl_spark.sources.csv_ingest import write_fixture_csv

from . import fixtures_geo as G


def test_file_date_from_name():
    assert streaming.file_date_from_name(
        "/x/focos_diario_br_20240502.csv"
    ) == dt.date(2024, 5, 2)
    assert streaming.file_date_from_name("2024-05-03.csv") == dt.date(2024, 5, 3)
    with pytest.raises(ValueError):
        streaming.file_date_from_name("focos.csv")


def test_landing_stream_drains_and_checkpoints(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    write_fixture_csv(
        str(landing / "focos_diario_br_20240501.csv"),
        G.FOCOS_HEADER,
        G.FOCOS_ROWS[:3],
        sep=";",
    )
    dims = {
        "municipios": G.municipios(),
        "biomas": G.biomas(),
        "ucs": G.ucs(),
        "tis": G.tis(),
        "uf_area": spark.createDataFrame(G.uf_area_rows(), UF_AREA),
    }
    wh = pipeline.Warehouse(str(tmp_path / "wh"))
    seen: list[tuple[dt.date, dict]] = []

    q = streaming.start_landing_stream(
        spark,
        str(landing),
        wh,
        dims,
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_batch=lambda d, m: seen.append((d, m)),
    )
    q.awaitTermination(120)
    assert [d for d, _ in seen] == [dt.date(2024, 5, 1)]
    assert seen[0][1]["rows_new"] == 3
    assert wh.read(spark, "curated_focos").count() == 3

    # a second file lands; a new availableNow drain processes ONLY it
    write_fixture_csv(
        str(landing / "focos_diario_br_20240502.csv"),
        G.FOCOS_HEADER,
        G.FOCOS_ROWS[3:6],
        sep=";",
    )
    seen.clear()
    q2 = streaming.start_landing_stream(
        spark,
        str(landing),
        wh,
        dims,
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_batch=lambda d, m: seen.append((d, m)),
    )
    q2.awaitTermination(120)
    assert [d for d, _ in seen] == [dt.date(2024, 5, 2)]
    assert seen[0][1]["rows_new"] == 3
    assert wh.read(spark, "curated_focos").count() == 6
    # daily marts reflect EVENT days (P10): every fixture row's
    # view_ts is on 2024-05-02, so both files fold into that one day
    daily = wh.read(spark, "focos_diario_uf")
    days = [r["day"] for r in daily.select("day").distinct().collect()]
    assert days == [dt.date(2024, 5, 2)]


def test_end_to_end_stream_with_midstream_restart_matches_batch(
    spark, tmp_path
):
    """VERDICT r3 #8: landing stream -> stateful first-seen dedup ->
    process_batch, one foreachBatch pipeline, killed MID-STREAM (the
    batch step dies after the first file has already been applied to
    the warehouse) and restarted on the same checkpoint. The failed
    micro-batch replays in full; the already-applied file's rows
    anti-join to zero; final warehouse state is IDENTICAL to a pure
    batch run over the same files — the reference's
    exactly-once-by-key idempotency contract (backfill.py:69-135)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    for name, rows in [
        ("focos_diario_br_20240501.csv", G.FOCOS_ROWS[:3]),
        ("focos_diario_br_20240502.csv", G.FOCOS_ROWS[3:6]),
        ("focos_diario_br_20240503.csv", G.FOCOS_ROWS[6:]),
    ]:
        write_fixture_csv(str(landing / name), G.FOCOS_HEADER, rows, sep=";")
    dims = {
        "municipios": G.municipios(),
        "biomas": G.biomas(),
        "ucs": G.ucs(),
        "tis": G.tis(),
        "uf_area": spark.createDataFrame(G.uf_area_rows(), UF_AREA),
    }
    wh = pipeline.Warehouse(str(tmp_path / "wh_stream"))
    ckpt = str(tmp_path / "ckpt_e2e")

    # crash after the FIRST file's process_batch committed
    seen: list = []

    def bomb(fdate, metrics):
        seen.append((fdate, metrics["rows_new"]))
        if len(seen) == 1:
            raise RuntimeError("mid-stream kill")

    q = streaming.start_landing_stream(
        spark, str(landing), wh, dims, checkpoint_dir=ckpt,
        on_batch=bomb, stateful_dedup=True,
    )
    with pytest.raises(Exception):
        q.awaitTermination(180)
        if q.exception() is not None:
            raise RuntimeError(q.exception().desc)
    assert len(seen) == 1  # one file applied, then the crash
    applied_rows = wh.read(spark, "curated_focos").count()
    assert applied_rows > 0

    # restart on the SAME checkpoint: the failed batch replays whole;
    # the already-applied file must contribute rows_new == 0
    seen.clear()
    q2 = streaming.start_landing_stream(
        spark, str(landing), wh, dims, checkpoint_dir=ckpt,
        on_batch=lambda d, m: seen.append((d, m["rows_new"])), stateful_dedup=True,
    )
    q2.awaitTermination(180)
    replayed = dict(seen)
    assert replayed[dt.date(2024, 5, 1)] == 0  # replay suppressed

    # equivalence: a pure batch run over the same files, fresh warehouse
    wh_batch = pipeline.Warehouse(str(tmp_path / "wh_batch"))
    pipeline.run_range(
        spark,
        wh_batch,
        [
            (dt.date(2024, 5, 1), str(landing / "focos_diario_br_20240501.csv")),
            (dt.date(2024, 5, 2), str(landing / "focos_diario_br_20240502.csv")),
            (dt.date(2024, 5, 3), str(landing / "focos_diario_br_20240503.csv")),
        ],
        dims,
        write_report=False,
    )

    def snapshot(w):
        cur = {
            tuple(r)
            for r in w.read(spark, "curated_focos")
            .select("event_hash", "file_date")
            .collect()
        }
        daily = {
            (str(r["day"]), r["uf"], r["n_focos"])
            for r in w.read(spark, "focos_diario_uf")
            .select("day", "uf", "n_focos")
            .collect()
        }
        return cur, daily

    assert snapshot(wh) == snapshot(wh_batch)


def _drain_dedup(spark, src_dir, ckpt, out: list):
    """One availableNow pass of the stateful dedup over the parquet
    landing dir, collecting emitted rows via foreachBatch."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_hash", T.StringType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src_dir)
    deduped = streaming.streaming_first_seen_dedup(
        stream, "event_hash", order_cols=["event_id"]
    )
    q = (
        deduped.writeStream.foreachBatch(
            lambda bdf, bid: out.extend(
                (r["event_hash"], r["event_id"]) for r in bdf.collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_dedup_across_batches_and_restarts(spark, tmp_path):
    """First-seen-per-key survives micro-batch boundaries AND query
    restarts (state lives in the checkpointed state store); within a
    batch the emitted row is the order_cols-minimum."""
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_dedup")

    df1 = spark.createDataFrame(
        [("a", 7), ("a", 3), ("b", 1)], "event_hash string, event_id long"
    )
    df1.coalesce(1).write.parquet(str(src / "f1"))
    out: list = []
    _drain_dedup(spark, str(src) + "/*", ckpt, out)
    # 'a' dupes within the first batch: only the event_id-min row emits
    assert sorted(out) == [("a", 3), ("b", 1)]

    # second file replays 'a' and 'b', introduces 'c' — a NEW query on
    # the same checkpoint must suppress the replayed keys
    df2 = spark.createDataFrame(
        [("a", 9), ("b", 8), ("c", 2)], "event_hash string, event_id long"
    )
    df2.coalesce(1).write.parquet(str(src / "f2"))
    out.clear()
    _drain_dedup(spark, str(src) + "/*", ckpt, out)
    assert out == [("c", 2)]


def _drain_windowed(spark, src_dir, ckpt, out: list):
    """One availableNow pass of the watermarked windowed aggregation,
    collecting APPEND-mode (finalized-only) rows via foreachBatch."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = streaming.windowed_event_counts(
        stream, window_duration="1 hour", watermark="2 hours"
    )
    q = (
        agg.writeStream.foreachBatch(
            lambda bdf, bid: out.extend(
                (
                    str(r["window_start"]),
                    str(r["window_end"]),
                    r["event_type"],
                    r["n_events"],
                    r["total_value"],
                )
                for r in bdf.collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windowed_counts_watermark_finalization_and_late_drop(
    spark, tmp_path
):
    """Append mode emits a window only after the watermark passes its
    end (every emitted row is final), and a row arriving later than
    the watermark allows is dropped — the late-data contract."""
    src = tmp_path / "wevents"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_win")
    schema = "event_type string, ts string, value double"

    # batch 1: two A rows in [10:00, 11:00) + a B row that pushes max
    # event time to 12:30 (watermark will become 10:30 after commit)
    spark.createDataFrame(
        [
            ("A", "2024-05-02 10:15:00", 1.0),
            ("A", "2024-05-02 10:45:00", 2.0),
            ("B", "2024-05-02 12:30:00", 3.0),
        ],
        schema,
    ).selectExpr(
        "event_type", "CAST(ts AS TIMESTAMP) ts", "value"
    ).coalesce(1).write.parquet(str(src / "f1"))
    out: list = []
    _drain_windowed(spark, str(src) + "/*", ckpt, out)
    assert out == []  # nothing finalized yet

    # batch 2: max event time -> 14:30; at batch START the watermark is
    # 10:30, so the 11:00-ending window is still open -> still nothing
    spark.createDataFrame(
        [("B", "2024-05-02 14:30:00", 4.0)], schema
    ).selectExpr(
        "event_type", "CAST(ts AS TIMESTAMP) ts", "value"
    ).coalesce(1).write.parquet(str(src / "f2"))
    out.clear()
    _drain_windowed(spark, str(src) + "/*", ckpt, out)
    # availableNow runs a trailing no-data batch after f2, so the
    # watermark advances to 12:30 within this drain and the [10:00,
    # 11:00) window finalizes here — count 2, sum 3.0, and FINAL
    assert out == [
        ("2024-05-02 10:00:00", "2024-05-02 11:00:00", "A", 2, 3.0)
    ]

    # batch 3: the late A@10:20 row is behind the 12:30 watermark and
    # must be dropped — the already-emitted A window must NOT re-emit
    # or grow; meanwhile the [12:00, 13:00) B window finalizes once
    # the watermark passes 13:00 (max event 16:00 -> watermark 14:00)
    spark.createDataFrame(
        [
            ("A", "2024-05-02 10:20:00", 100.0),  # too late: dropped
            ("C", "2024-05-02 16:00:00", 5.0),
        ],
        schema,
    ).selectExpr(
        "event_type", "CAST(ts AS TIMESTAMP) ts", "value"
    ).coalesce(1).write.parquet(str(src / "f3"))
    out.clear()
    _drain_windowed(spark, str(src) + "/*", ckpt, out)
    assert out == [
        ("2024-05-02 12:00:00", "2024-05-02 13:00:00", "B", 1, 3.0)
    ]
