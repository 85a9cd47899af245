"""Distribution-drift rules (R8): PSI + two-sample KS on the n_tok histogram,
chi-square on source frequencies — vs a pinned baseline profile.

Reference analogue: drift is detected *implicitly* there — a log line that
matches no warm-start template becomes a new cluster and is flagged anomalous
(``logparser/Drain.py:233-239, 345-354, 367-373``); our engine makes the
distribution comparison explicit against the pinned profile (FIXTURES.md F4).

The heavy lifting (histogram + frequency counts per partition) happens inside
the single stats scan (column_stats.stats_pass); this module is driver-side
NumPy over tiny (n_parts × buckets) arrays. SciPy is absent in the sandbox,
so the KS D-statistic and the chi-square statistic are computed directly from
ECDFs / shares and compared to pinned thresholds rather than p-values.
"""

from __future__ import annotations

import numpy as np

from log_anomaly_detector_spark.config import RuleConfig

_EPS = 1e-6  # share smoothing for empty buckets (pinned)


def psi(p_counts: np.ndarray, q_counts: np.ndarray) -> float:
    """Population Stability Index between observed (p) and baseline (q)."""
    p = p_counts / max(p_counts.sum(), 1)
    q = q_counts / max(q_counts.sum(), 1)
    p = np.clip(p, _EPS, None)
    q = np.clip(q, _EPS, None)
    return float(np.sum((p - q) * np.log(p / q)))


def ks_d(p_counts: np.ndarray, q_counts: np.ndarray) -> float:
    """Two-sample KS D-statistic from binned data: max ECDF distance."""
    p = np.cumsum(p_counts) / max(p_counts.sum(), 1)
    q = np.cumsum(q_counts) / max(q_counts.sum(), 1)
    return float(np.max(np.abs(p - q)))


def chi2_norm(p_counts: np.ndarray, q_counts: np.ndarray) -> float:
    """Scale-free chi-square statistic over frequency *shares*:
    sum((p_i - q_i)^2 / q_i) with share smoothing."""
    p = p_counts / max(p_counts.sum(), 1)
    q = np.clip(q_counts / max(q_counts.sum(), 1), _EPS, None)
    return float(np.sum((p - q) ** 2 / q))


def drift_verdicts(
    stats_rows: list[dict], baseline: dict, cfg: RuleConfig, sources: list[str]
) -> list[dict]:
    """Per-(part_id, drift-rule) verdicts from the collected stats rows.

    ``baseline`` is the pinned profile from datagen.gen_baseline_profile:
    {"hist": [...], "source_counts": {source: n}, "n": N}. ``sources`` must be
    the same ordered dimension list given to stats_pass (engine guarantees).
    """
    base_hist = np.asarray(baseline["hist"], dtype=np.float64)
    base_src = np.asarray(
        [baseline["source_counts"].get(s, 0) for s in sources], dtype=np.float64
    )
    n_sources = len(sources)
    out = []
    dp = cfg.score_round_dp
    for r in stats_rows:
        pid = r["part_id"]
        hist = np.asarray([r[f"hist_{b}"] for b in range(cfg.hist_buckets)], dtype=np.float64)
        src = np.asarray([r[f"src_{i}"] for i in range(n_sources)], dtype=np.float64)
        for rule_id, stat, th in (
            ("drift_psi", psi(hist, base_hist), cfg.psi_threshold),
            ("drift_ks", ks_d(hist, base_hist), cfg.ks_threshold),
            ("drift_chi2", chi2_norm(src, base_src), cfg.chi2_threshold),
        ):
            stat = round(stat, dp)
            out.append(
                {
                    "part_id": pid,
                    "rule_id": rule_id,
                    "passed": not (stat > th),
                    "observed_stat": stat,
                    "threshold": th,
                }
            )
    return out
