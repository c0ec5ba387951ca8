"""Frozen model artifacts (data, not code).

`frozen_statistical.WEIGHTS` is produced by scripts/train_statistical.py
(distributed MIML-lite training over the synthetic corpus) and committed
so inference — and the driver's DuckDB oracle — score against the exact
same numbers.
"""
