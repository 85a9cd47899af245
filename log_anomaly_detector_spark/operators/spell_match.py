"""Spell-style LCS template matching as a Spark similarity join — the
reference's SECOND parser family (logparser/Spell.py), completing J8's
parenthetical citation.

Reference semantics being reproduced (logparser/Spell.py):

* ``LCS`` (Spell.py:59-81) — classic O(n·m) longest-common-subsequence DP
  between the token sequence and a template's token list; tokens compare
  literally (a template ``<*>`` never equals a word);
* ``LCSMatch`` (Spell.py:112-133) — candidate prefilter: skip templates whose
  DISTINCT-token overlap with the sequence is < 0.5·|seq|; best = max LCS
  length, ties prefer the SHORTER template; accept iff
  ``lcs_len >= tau · |seq|``;
* the sequential loop (Spell.py:245-266) tries PrefixTreeMatch →
  SimpleLoopMatch → LCSMatch; the tree/loop tiers are pure short-circuit
  OPTIMIZATIONS of the same decision — the matcher below implements the
  authoritative LCS tier.

Spark lift: templates are a dim-sized broadcast side; the set-overlap
prefilter becomes a PREFIX-PRINCIPLE EQUI TOKEN JOIN (a line's first
|distinct|−⌈len/2⌉+1 canonical-order distinct tokens must hit any
qualifying template, so candidates come from a hash join on single tokens,
never a per-line nested-loop scan of the dim — plan-asserted); the exact
overlap check then runs on candidates only, and LCS itself
is a pure Catalyst fold: ``aggregate`` over the line's tokens with the DP row
as the accumulator. One step of the classic recurrence

    L[i][j] = max(L[i-1][j-1] + eq(i,j), L[i-1][j], L[i][j-1])

is computed as ``u[j] = eq ? row[j-1]+1 : row[j]`` followed by a prefix-max
(valid because adjacent DP cells differ by ≤ 1); the prefix-max is an
O(m²) ``transform`` + ``array_max`` — m is a log-template length (tens), so
the whole score is a few hundred JVM-side integer ops per candidate, no
Python anywhere. The per-line argmax is a window over the (small) candidate
set, tie-break pinned (desc lcs_len, asc template length, asc template_id —
the reference scans insertion order, which a distributed argmax cannot
reproduce; the pinned order is deterministic at any parallelism).

The identical integer DP is expressible in DuckDB as a recursive CTE
(one iteration per line token, same prefix-max trick), so the operator gets
a HARD value oracle — see ``_SPELL_SQL``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TAU = 0.5  # Spell's default tau (Spell.py:49) — accept iff lcs >= tau·|seq|


def lcs_length(a: Column, b: Column) -> Column:
    """LCS length of two array<string> columns as a JVM-side integer fold
    (Spell.py:59-81 semantics: literal token equality)."""
    m = F.size(b)
    init = F.array_repeat(F.lit(0), m + 1)

    def step(row: Column, tok: Column) -> Column:
        # u[j] = eq(tok, b[j]) ? row[j-1] + 1 : row[j]   (1-based j over b)
        prev_cur = F.zip_with(
            F.slice(row, 1, m),
            F.slice(row, 2, m),
            lambda p, c: F.struct(p.alias("p"), c.alias("c")),
        )
        u = F.zip_with(
            prev_cur,
            b,
            lambda st, tb: F.when(tok == tb, st["p"] + 1).otherwise(st["c"]),
        )
        # new row = [0] ++ prefix-max(u)  (adjacent DP cells differ ≤ 1, so
        # the running max IS the full recurrence)
        return F.concat(
            F.array(F.lit(0)),
            F.transform(
                F.sequence(F.lit(1), m), lambda j: F.array_max(F.slice(u, 1, j))
            ),
        )

    return F.when((F.size(a) == 0) | (m == 0), F.lit(0)).otherwise(
        F.element_at(F.aggregate(a, init, step), -1)
    )


def spell_match(
    lines: DataFrame,
    templates: DataFrame,
    tau: float = TAU,
    line_id: str = "line_id",
    line_tokens: str = "tokens",
    template_id: str = "template_id",
    template_tokens: str = "template_tokens",
) -> DataFrame:
    """For each line, the best template by Spell's LCSMatch (Spell.py:112-133),
    else NULL (= the line would found a new cluster, Spell.py:252-255).

    Output: (line_id, matched_template_id nullable, lcs_len nullable int).
    Candidates: distinct-token overlap ≥ 0.5·|seq| (the reference's set
    prefilter — templates outside it can never win anyway for tau ≥ 0.5,
    since lcs_len ≤ distinct-overlap is false in general with duplicate
    tokens, but the reference applies exactly this filter and so do we).
    Accept: lcs_len ≥ tau·|seq|. Tie-break: desc lcs_len, asc |template|,
    asc template_id (pinned; reference: insertion order, Spell.py:124-127).
    """
    l = lines.select(
        F.col(line_id).alias("_lid"),
        F.col(line_tokens).alias("_ltok"),
        F.size(line_tokens).alias("_n"),
    )
    t = templates.select(
        F.col(template_id).alias("_tid"),
        F.col(template_tokens).alias("_ttok"),
        F.size(template_tokens).alias("_m"),
    )
    # ---- candidate generation: EQUI token join via the prefix principle,
    # never a per-line scan of the dim (a non-equi overlap predicate would
    # plan a BroadcastNestedLoopJoin — linear in |dim| per line). The
    # reference's prefilter is |distinct(A) ∩ B| ≥ 0.5·len(A) (raw length!).
    # Any probe set of the first |distinct(A)| − ⌈len(A)/2⌉ + 1 canonical-
    # order distinct tokens must hit a qualifying template: if it misses,
    # the overlap is ≤ ⌈len(A)/2⌉ − 1 < 0.5·len(A). Lines whose probe
    # length is ≤ 0 can match nothing and fall out naturally (re-attached
    # as unmatched by the final left join). ----------------------------------
    min_overlap = F.ceil(F.col("_n") / 2).cast("int")
    dset = F.array_sort(F.array_distinct(F.col("_ltok")))
    probe_len = F.size(dset) - min_overlap + 1
    probes = l.select(
        "_lid", F.explode(F.slice(dset, 1, F.greatest(probe_len, F.lit(0)))).alias("_tok")
    )
    t_toks = t.select(
        "_tid", F.explode(F.array_distinct(F.col("_ttok"))).alias("_tok")
    )
    cand_ids = (
        probes.join(F.broadcast(t_toks), "_tok")
        .select("_lid", "_tid")
        .dropDuplicates(["_lid", "_tid"])
    )
    cand = (
        cand_ids.join(l, "_lid")
        .join(F.broadcast(t), "_tid")
        # the exact reference prefilter, now evaluated on candidates only
        .filter(
            F.size(F.array_intersect(F.col("_ltok"), F.col("_ttok")))
            >= 0.5 * F.col("_n")
        )
    )
    lcs = lcs_length(F.col("_ltok"), F.col("_ttok"))
    scored = cand.select("_lid", "_n", "_tid", lcs.alias("_lcs"), "_m")
    w = Window.partitionBy("_lid").orderBy(
        F.desc("_lcs"), F.asc("_m"), F.asc("_tid")
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_lid", "_tid", "_lcs")
    )
    # zero-token lines: the reference's LCSMatch arithmetic matches them to
    # the SHORTEST template (every lcs is 0, prefilter 0 < 0.5·0 never skips,
    # accept 0 ≥ tau·0 holds; our pinned tie-break → min (len, id)). The
    # probe join above can't generate them (empty probe set), so they take
    # this dedicated path: constant-key equi join against the 1-row shortest
    # template (dim-sized aggregate, no nested loop).
    # constant-but-NON-FOLDABLE join key (pmod(col, 1) — a literal key would
    # constant-fold and degenerate the equi join back into a nested loop,
    # the shape the plan test forbids; same trick as relational.one_part)
    shortest = (
        t.orderBy("_m", "_tid")
        .limit(1)
        .select(F.pmod(F.col("_m"), F.lit(1)).alias("_k"), F.col("_tid"))
    )
    empty_best = (
        l.filter(F.col("_n") == 0)
        .select("_lid", F.pmod(F.col("_n"), F.lit(1)).alias("_k"))
        .join(shortest, "_k")
        .select("_lid", "_tid", F.lit(0).alias("_lcs"))
    )
    best = best.unionByName(empty_best)
    # every line gets a row; candidate-less lines surface as NULL/NULL
    return l.select("_lid", "_n").join(best, "_lid", "left").select(
        F.col("_lid").alias(line_id),
        F.when(F.col("_lcs") >= tau * F.col("_n"), F.col("_tid")).alias(
            "matched_template_id"
        ),
        F.col("_lcs").cast("int").alias("lcs_len"),
    )


# --- driver-contract entry: same fixture shape as q_template_match (lines =
# 5-word prefixes of every document; templates = wildcarded prefixes of the
# first 25 docs), scored with Spell's LCS semantics instead of Drain's
# positional similarity — the two parser families are directly comparable on
# identical inputs. ------------------------------------------------------------
def q_spell_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_anomaly_detector_spark.functions.text_funcs import words
    from log_anomaly_detector_spark.operators.relational import t, widen

    docs = t(spark, sf_dir, "documents")
    # the line side is consumed three times (probe explode, candidate
    # re-join, final left join), each tokenizing off the single-split scan —
    # widen it once (template side keeps the plain scan: doc_id<25 pushes)
    lines = widen(docs.select("doc_id", "text"), "doc_id").select(
        F.col("doc_id").alias("line_id"),
        F.slice(words(F.col("text")), 1, 5).alias("tokens"),
    )
    templates = docs.filter(F.col("doc_id") < 25).select(
        F.concat(F.lit("T"), F.col("doc_id").cast("string")).alias("template_id"),
        F.expr(
            "concat(slice(split(trim(text), ' +'), 1, 2), array('<*>'), "
            "slice(split(trim(text), ' +'), 4, 2))"
        ).alias("template_tokens"),
    )
    return spell_match(lines, templates, tau=TAU)


_SPELL_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS w FROM documents
), lines AS (
  SELECT doc_id AS line_id, list_slice(w, 1, 5) AS ltok, len(list_slice(w, 1, 5)) AS n
  FROM toks
), tmpl AS (
  SELECT 'T' || doc_id AS tid,
         list_concat(list_concat(list_slice(w, 1, 2), ['<*>']), list_slice(w, 4, 5)) AS ttok
  FROM toks WHERE doc_id < 25
), cand AS (
  SELECT l.line_id, l.ltok, l.n, t.tid, t.ttok, len(t.ttok) AS m
  FROM lines l LEFT JOIN tmpl t
    ON len(list_filter(list_distinct(l.ltok), x -> list_contains(t.ttok, x)))
       >= 0.5 * l.n
), dp AS (
  SELECT line_id, ltok, n, tid, ttok, m, 0 AS i,
         list_transform(range(0, coalesce(m, 0) + 1), x -> 0) AS row
  FROM cand
  UNION ALL
  SELECT line_id, ltok, n, tid, ttok, m, i + 1,
         list_prepend(0, list_transform(range(1, m + 1),
           j -> list_max(list_transform(range(1, j + 1),
                  k -> CASE WHEN ltok[i + 1] = ttok[k]
                            THEN row[k] + 1 ELSE row[k + 1] END))))
  FROM dp WHERE tid IS NOT NULL AND i < n
), lcs AS (
  SELECT line_id, n, tid, m, row[m + 1] AS lcs_len
  FROM dp WHERE tid IS NOT NULL AND i = n
  UNION ALL
  SELECT line_id, n, NULL AS tid, NULL AS m, NULL AS lcs_len
  FROM cand WHERE tid IS NULL
)
SELECT line_id,
       CASE WHEN lcs_len >= {TAU} * n THEN tid END AS matched_template_id,
       cast(lcs_len AS int) AS lcs_len
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY line_id
    ORDER BY lcs_len DESC NULLS LAST, m ASC NULLS LAST, tid
  ) AS rn
  FROM lcs
) WHERE rn = 1
"""

QUERIES = {"spell_match": q_spell_match}
ORACLES = {"spell_match": _SPELL_SQL}
