"""Empty-input robustness sweep: every contract query must EXECUTE against
empty tables carrying the real schemas.

At 100 TB an empty slice is a routine input — a filter that matched nothing,
a new partition, a source that produced no rows today. The declarative plans
handle it for free; what this sweep guards are the DRIVER-SIDE probes
(dim probe `.first()`, iterative convergence counts, quantizer seeds), which
are exactly where a pipeline crashes with an opaque TypeError instead of
producing an empty, correctly-typed result. Caught on first run: a NULL
convergence sum spinning connected_components to its round cap, and three
ANN queries dereferencing a missing dim-probe row.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from log_anomaly_detector_spark.oracle_check import TABLES

QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").schema
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes_on_empty_tables(spark, empty_sf_dir, name):
    df = QUERIES[name](spark, empty_sf_dir)
    rows = df.collect()
    # empty in → empty (or schema-only constant) out; executing without a
    # driver-side crash is the contract. A few aggregates legitimately emit
    # bounded constant rows on empty input (e.g. the 9-row threshold grid,
    # global-aggregate summaries) — bounded means dim/config-sized, never
    # input-sized.
    assert len(rows) <= 100, (name, len(rows))
