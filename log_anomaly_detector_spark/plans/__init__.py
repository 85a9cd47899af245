"""Plan inspection utilities — Catalyst IS the planner; this module only
*audits* the physical plans it produces (pushdown, pruning, join strategy,
codegen spans)."""

from log_anomaly_detector_spark.plans.inspect import (  # noqa: F401
    forced_raw_broadcasts,
    formatted_plan,
    plan_facts,
    unpartitioned_windows,
)
