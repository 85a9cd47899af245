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
# Harvested by executing the full sweep; the first harvest caught a REAL
# crash — mm_features' Arrow kernel np.frombuffer(None) on NULL payloads,
# now excluded JVM-side before the Arrow stage (operators/multimodal.py).
NULL_EXPECTED: dict[str, int] = {
    "ann_ivf": 0,            # all vectors NULL → dim probe short-circuits
    "ann_lsh": 0,
    "anti_join": 1,          # the NULL customer-name group
    "binary_meta": 500,      # JVM-side: NULL payload → NULL n_bytes/sha256
    "broadcast_join_revenue": 1,
    "column_stats": 1,
    "cosine_topk": 0,
    "decontaminate": 0,      # NULL text excluded → no train docs at all
    "dedup_clusters": 0,
    "distinct_exact": 1,
    "doc_fingerprint": 500,  # fingerprint(NULL) rides as NULL per doc
    "drift_hist": 9,         # numeric-column histogram — unaffected by text
    "embedding_mean": 0,     # posexplode(NULL) emits nothing
    "embedding_near_dup": 0,
    "exact_dup_groups": 1,   # every NULL prefix hashes to the one group
    "filter_pack": 0,
    "fixed_window_chunks": 0,
    "group_collect_ordered": 15,
    "hll_distinct": 1,
    "inner_join_count": 1,
    "jaccard_near_dup": 0,
    "kmv_distinct": 0,
    "langid": 500,
    "left_join_default": 1,
    "mask_tokens": 500,
    "minhash_lsh_pairs": 0,
    "mm_features": 0,        # NULL payloads excluded before the Arrow stage
    "pack_sequences": 500,
    "pagination": 100,
    "param_extract": 1000,
    "pricing_summary": 1,
    "quality_score": 500,
    "quantile_median": 1,
    "ranked_mapping": 1,
    "regex_hash_pack": 1000,
    "repetition_filter": 0,  # NULL tokens → size NULL → length gate drops
    "seeded_sample": 149,    # hash of numeric keys — text plays no part
    "seeded_split": 2,
    "semi_join": 0,
    "simhash": 0,
    "sort_by_length": 50,
    "source_mix": 1,
    "spell_match": 500,
    "stitch_lines": 1473,
    "template_frequency": 1,
    "template_induction": 0,  # no tokens → empty dim, typed empty result
    "template_match": 500,
    "threshold_grid": 9,
    "threshold_verdict": 15,
    "to_seq": 0,
    "token_count": 500,
    "topk_per_group": 449,
    "union_dedup": 1,
    "vocab_build": 0,
}


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
