"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.12 superset).

The built-in windows (streaming/windows.py) cover time-bucketed
aggregation; this module holds arbitrary per-key running state — the
pattern for dedup-on-arrival, running profiles, or incremental graph
degree maintenance over an edge stream.

State is a per-key tuple managed by the engine (checkpointed, restored
on restart); each microbatch delivers the key's new rows as Arrow
batches.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained across microbatches.

    Emits one row per key per batch with the cumulative totals — the
    minimal template for custom keyed state (extend the state tuple for
    richer profiles).
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total_value": [total]})

    key_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def seen_edge_filter(
    edges: DataFrame,
    u_col: str = "_u",
    v_col: str = "_v",
) -> DataFrame:
    """Streaming first-occurrence filter: emit each (u, v) edge only the
    first time it appears across the whole stream (stateful dedup-on-
    arrival — the streaming twin of the ingest last-write-wins dedup,
    inverted to first-write-wins as required for append-only sinks).
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        already = state.exists
        if not already:
            state.update((1,))
            yield pd.DataFrame({u_col: [key[0]], v_col: [key[1]]})
        else:
            yield pd.DataFrame({u_col: [], v_col: []})

    return edges.groupBy(u_col, v_col).applyInPandasWithState(
        update,
        outputStructType=f"{u_col} string, {v_col} string",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
