"""Physical-plan-shaping utilities: the knobs a 100 TB deployment turns
(bucketing, skew salting, partitioned layout) packaged as functions with
plan-level tests. See ``plans.scale``."""
