"""Frozen model artifacts (data, not code).

`frozen_statistical.BAG_WEIGHTS` is produced by
scripts/train_statistical.py (distributed MIML soft-EM over the
synthetic corpus, BAGGING-resampled folds) and committed so inference —
and the driver's DuckDB oracle — score against the exact same numbers.
"""
