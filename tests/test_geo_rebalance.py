"""_rebalance_for_compute partition-estimate fallbacks (ADVICE r4 #3,
VERDICT r4 #6): remote (hdfs://s3://) inputs must fall back to the RDD
probe instead of silently disabling the rebalance, and a Connect-like
session (no SparkContext / no df.rdd) must skip the rebalance
gracefully rather than raise. Pure driver-side stubs — no
SparkSession."""

from __future__ import annotations

import numpy as np

from inpe_queimadas_etl_spark.operators.geo import (
    _REBALANCE_MIN_VERTICES,
    _rebalance_for_compute,
)


class _Poly:
    def __init__(self, n_vertices: int):
        self.rings = [np.zeros((n_vertices, 2))]


HEAVY = [_Poly(_REBALANCE_MIN_VERTICES + 1)]
LIGHT = [_Poly(10)]


class _Conf:
    def get(self, key, default=None):
        return default


class _Ctx:
    defaultParallelism = 32


class _Session:
    conf = _Conf()
    sparkContext = _Ctx()


class _ConnectSession:
    conf = _Conf()

    @property
    def sparkContext(self):
        raise AttributeError("sparkContext is not supported on Connect")


class _Rdd:
    def __init__(self, nparts):
        self._n = nparts

    def getNumPartitions(self):
        return self._n


class _FakeDF:
    """Just enough DataFrame surface for _rebalance_for_compute."""

    def __init__(self, session, files, rdd=None, rdd_error=None):
        self.sparkSession = session
        self._files = files
        self._rdd = rdd
        self._rdd_error = rdd_error
        self.repartitioned_to = None

    def inputFiles(self):
        return self._files

    @property
    def rdd(self):
        if self._rdd_error is not None:
            raise self._rdd_error
        return self._rdd

    def repartition(self, n):
        self.repartitioned_to = n
        return self


def test_remote_uris_fall_back_to_rdd_probe():
    """hdfs:// files cannot be os.path.getsize'd; the estimate must
    use the RDD probe (1 partition << 32 cores) and still rebalance."""
    df = _FakeDF(
        _Session(),
        ["hdfs://nn:8020/warehouse/events/part-0.parquet"],
        rdd=_Rdd(1),
    )
    out = _rebalance_for_compute(df, HEAVY)
    assert out.repartitioned_to == 32


def test_remote_uris_with_enough_partitions_do_not_repartition():
    df = _FakeDF(
        _Session(),
        ["s3://bucket/events/part-0.parquet"],
        rdd=_Rdd(64),
    )
    out = _rebalance_for_compute(df, HEAVY)
    assert out.repartitioned_to is None


def test_connect_like_rdd_failure_skips_rebalance():
    """No statable files AND df.rdd unsupported (Spark Connect): the
    rebalance must degrade to a no-op, not raise."""
    df = _FakeDF(
        _Session(),
        ["hdfs://nn:8020/warehouse/events/part-0.parquet"],
        rdd_error=Exception("PandasNotImplementedError: rdd"),
    )
    out = _rebalance_for_compute(df, HEAVY)
    assert out is df
    assert df.repartitioned_to is None


def test_connect_like_sparkcontext_failure_skips_rebalance():
    df = _FakeDF(_ConnectSession(), [], rdd=_Rdd(1))
    out = _rebalance_for_compute(df, HEAVY)
    assert out is df
    assert df.repartitioned_to is None


def test_local_files_never_touch_rdd(tmp_path):
    """file:// inputs size via getsize; the RDD probe (expensive
    plan-to-RDD conversion) must not be touched on the happy path."""
    p = tmp_path / "part-0.parquet"
    p.write_bytes(b"x" * 1024)
    df = _FakeDF(
        _Session(),
        [p.as_uri()],
        rdd_error=AssertionError("rdd must not be accessed"),
    )
    out = _rebalance_for_compute(df, HEAVY)
    assert out.repartitioned_to == 32


def test_light_polygons_skip_everything():
    df = _FakeDF(
        _ConnectSession(), [], rdd_error=AssertionError("untouched")
    )
    assert _rebalance_for_compute(df, LIGHT) is df
