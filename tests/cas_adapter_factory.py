"""A `--metadata-adapter` factory for CLI tests: returns the local
conditional-put simulator rooted at $SPARK_GRAFT_TEST_CAS_ROOT —
the exact shape a production S3/GCS adapter module would export
(one callable taking the scheme, returning a MetadataArbiter)."""

from __future__ import annotations

import os

from inpe_queimadas_etl_spark.operators.metaplane import (
    LocalCasArbiter,
    MetadataArbiter,
)


def factory(scheme: str) -> MetadataArbiter:
    root = os.environ["SPARK_GRAFT_TEST_CAS_ROOT"]
    return LocalCasArbiter(scheme, root)


def not_an_arbiter(scheme: str):
    return object()  # for the registration type-check test
