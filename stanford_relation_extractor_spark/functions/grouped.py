"""groupBy().applyInPandas semantics at mapInPandas cost.

``groupBy(keys).applyInPandas(fn)`` ships every group as its own Arrow
exchange and Python call — measured ~1-3ms of pure overhead per group,
i.e. ~15s for a few thousand tiny groups (guide §4: the boundary cost,
not the compute). ``map_groups_in_pandas`` clusters the stream on the
group key once (one explicit scale-derived repartition + in-partition
sort), then iterates the groups INSIDE each Arrow batch:

* a group that straddles an Arrow batch boundary is carried over to the
  next batch, so every group is judged exactly once on complete rows;
* per-group outputs are buffered and emitted as consolidated frames so
  the return path is a few Arrow batches per task, not one per group.

Row ORDER differs from applyInPandas (group iteration order inside
partitions); row SET is identical — callers of this helper are
set-semantics operators checked by order-insensitive oracles.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

_EMIT_ROWS = 4096


def map_groups_in_pandas(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
    n_parts: int | None = None,
) -> DataFrame:
    """Apply ``fn`` once per distinct ``keys`` group of ``df``.

    ``fn`` receives the group's complete rows (a pandas frame with the
    input columns) and returns a frame matching ``schema``.
    """
    parts = (
        n_parts
        if n_parts is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    src = df.repartition(parts, *keys).sortWithinPartitions(*keys)

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        leftover: pd.DataFrame | None = None
        buffer: list[pd.DataFrame] = []
        buffered = 0

        def emit_groups(pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
            nonlocal buffered
            # dropna=False: groupBy().applyInPandas treats NULL keys as a
            # group; pandas silently drops NaN groups by default.
            for _, g in pdf.groupby(keys, sort=False, dropna=False):
                out = fn(g)
                if out is not None and len(out):
                    buffer.append(out)
                    buffered += len(out)
                if buffered >= _EMIT_ROWS:
                    yield pd.concat(buffer, ignore_index=True)
                    buffer.clear()
                    buffered = 0

        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_key = tuple(pdf[k].iloc[-1] for k in keys)
            is_last = None
            for k, v in zip(keys, last_key):
                # NaN-safe: `col == NaN` is all-False, which would split a
                # NULL-keyed group across batches instead of carrying it.
                cond = pdf[k].isna() if pd.isna(v) else (pdf[k] == v)
                is_last = cond if is_last is None else (is_last & cond)
            leftover = pdf[is_last]
            body = pdf[~is_last]
            if len(body):
                yield from emit_groups(body)
        if leftover is not None and len(leftover):
            yield from emit_groups(leftover)
        if buffer:
            yield pd.concat(buffer, ignore_index=True)

    return src.mapInPandas(runner, schema=schema)
