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


# Exact expected row count on fully-empty input, per query. Today every
# contract query — including the global aggregates and the config-sized
# grids — produces ZERO rows from zero input (harvested by running the full
# sweep; grids/thresholds are all derived from data, not emitted as
# constants). A query that legitimately emits a bounded constant shape on
# empty input must REGISTER it here with a comment naming the constant —
# the loose `<= 100` proxy this replaces would have let ~90 junk rows
# through as "bounded" (r4 verdict minor #4).
EMPTY_EXPECTED: dict[str, int] = {name: 0 for name in QUERIES}


def test_empty_expectation_map_covers_registry():
    assert sorted(EMPTY_EXPECTED) == sorted(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes_on_empty_tables(spark, empty_sf_dir, name):
    df = QUERIES[name](spark, empty_sf_dir)
    rows = df.collect()
    # executing without a driver-side crash is the contract; the output
    # shape is pinned exactly per query
    assert len(rows) == EMPTY_EXPECTED[name], (name, len(rows))
