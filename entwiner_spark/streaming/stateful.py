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
from pyspark.sql import functions as F
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


def stream_asof_enrich(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    key_col: str = "user_id",
    left_value: str = "value",
    right_value: str = "value",
) -> DataFrame:
    """Streaming as-of enrichment: each left event carries the latest
    right value at-or-before it — the streaming twin of
    operators/asof.asof_join (same union+tag design, with the window
    replaced by per-key engine state).

    Both streams are tagged and unioned (right ``_side=0`` sorts before
    left at equal timestamps — the inclusive backward match), grouped by
    key, and a per-key (ts, value) state holds the most recent right
    row across microbatches.  Within a batch, rows process in
    ``(ts, _side)`` order, so in-order arrivals reproduce the batch
    as-of exactly; a right row that ARRIVES after a left event has been
    emitted cannot retro-match it — the inherent append-mode streaming
    semantics (the batch operator is the replay/backfill path).

    State per key is ONE (long, double) pair — constant memory, safe at
    any key cardinality.
    """
    l = left.select(
        F.col(key_col),
        F.col(on),
        F.lit(1).alias("_side"),
        F.col(left_value).cast("double").alias("_v"),
    )
    r = right.select(
        F.col(key_col),
        F.col(on),
        F.lit(0).alias("_side"),
        F.col(right_value).cast("double").alias("_v"),
    )
    u = l.unionByName(r)
    key_type = left.schema[key_col].dataType.simpleString()

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_us, last_v = state.get if state.exists else (None, None)
        pdf = pd.concat(list(pdfs)).sort_values([on, "_side"], kind="mergesort")
        out = []
        # itertuples mangles leading-underscore names; zip the columns
        for ts, side, v in zip(pdf[on], pdf["_side"], pdf["_v"]):
            ts_us = int(pd.Timestamp(ts).value // 1_000)
            if side == 0:
                if last_us is None or ts_us >= last_us:
                    last_us, last_v = ts_us, None if pd.isna(v) else float(v)
            else:
                out.append(
                    (
                        key[0],
                        ts,
                        None if pd.isna(v) else float(v),
                        last_v,
                        None
                        if last_us is None
                        else pd.Timestamp(last_us * 1_000),
                    )
                )
        if last_us is not None:
            state.update((last_us, last_v))
        yield pd.DataFrame(
            out,
            columns=[key_col, on, left_value, "_asof_value", "_asof_ts"],
        )

    return u.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, {on} timestamp, {left_value} double, "
            "_asof_value double, _asof_ts timestamp"
        ),
        stateStructType="last_us long, last_v double",
        outputMode="append",
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


def stream_ewma(
    events: DataFrame,
    alpha: float = 0.3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of :func:`operators.timeseries.ewma`: per-key
    EWMA carried across microbatches as one scalar of state (last y).

    Within each microbatch the key's rows are folded in (ts, id)
    order with the SAME literal arithmetic as the batch operator
    (``y = alpha*x + (1-alpha)*y``), so as long as arrivals respect
    event order across batches — the normal replay/ingest case — the
    streaming output equals the batch output row for row (asserted in
    tests, like stream_asof_enrich).  State is one double per key:
    constant memory, no timeout needed.
    """
    beta = 1.0 - alpha

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        has_y, y = state.get if state.exists else (False, 0.0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col])
        ids, outs = [], []
        for eid, x in zip(rows[id_col], rows[value_col]):
            x = float(x)
            y = x if not has_y else alpha * x + beta * y
            has_y = True
            ids.append(eid)
            outs.append(y)
        state.update((has_y, y))
        yield pd.DataFrame(
            {key_col: [key[0]] * len(ids), id_col: ids, "ewma": outs}
        )

    # id type mirrors the input schema (like key_col) so string event
    # ids that work in the batch twin work here too
    key_type = events.schema[key_col].dataType.simpleString()
    id_type = events.schema[id_col].dataType.simpleString()
    raw = events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, {id_col} {id_type}, ewma double",
        stateStructType="has_y boolean, y double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # round exactly like the batch operator (JVM-side F.round) so
    # stream == batch holds on the raw outputs, not modulo rounding
    return raw.select(key_col, id_col, F.round("ewma", 6).alias("ewma"))


def stream_anomaly_zscore(
    events: DataFrame,
    window: int = 10,
    min_prev: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of the e13 trailing-window z-score: per key the
    state is the last ``window`` values (a bounded deque — constant
    memory per key), each arriving event is scored against the stats
    of its predecessors using the SAME rounded-stats arithmetic as the
    batch query, so in-order arrival gives stream == batch row for
    row.
    """
    import math

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (hist,) = state.get if state.exists else ([],)
        hist = list(hist)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col])
        ids, zs, flags = [], [], []
        for eid, x in zip(rows[id_col], rows[value_col]):
            x = float(x)
            prev = hist[-window:]
            n_prev = len(prev)
            if n_prev >= min_prev:
                m = round(sum(prev) / n_prev, 6)
                s = round(sum(v * v for v in prev) / n_prev, 6)
                var = s - m * m
                if var > 0:
                    z_raw = (x - m) / math.sqrt(var)
                    z, flag = round(z_raw, 6), abs(z_raw) > 3.0
                else:
                    z, flag = 0.0, False
            else:
                z, flag = 0.0, False
            ids.append(eid)
            zs.append(z)
            flags.append(flag)
            hist.append(x)
        state.update((hist[-window:],))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(ids),
                id_col: ids,
                "z": zs,
                "is_anomaly": flags,
            }
        )

    key_type = events.schema[key_col].dataType.simpleString()
    id_type = events.schema[id_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, {id_col} {id_type}, z double, is_anomaly boolean"
        ),
        stateStructType="hist array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_map_match(
    fixes: DataFrame,
    edges: DataFrame,
    max_dist_m: float = 50.0,
    k_candidates: int = 5,
    sigma_m: float = 10.0,
    trans_adjacent: float = 2.0,
    trans_jump: float = 20.0,
    trace_key: str = "trace_id",
    seq_col: str = "seq",
    lon_col: str = "lon",
    lat_col: str = "lat",
    edge_key: str = "fid",
    coords_col: str = "coordinates",
    cell_deg: float | None = None,
    reorder_window: int = 0,
    stall_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming ONLINE map matching — the §2.12 twin of
    :func:`operators.matching.map_match` for live GPS feeds.

    Candidates come from the SAME grid-cell machinery as batch (a
    stream-static equi-join on (cx, cy) against the static edge
    table + the exact point-to-LineString refine) — but the batch
    per-point top-k window and pair dedup are NOT stream-expressible
    (unbounded state), so both happen inside the stateful UDF per
    microbatch (exact: a fix arrives once, so its cell-duplicate
    candidates land in the same batch).  Per-trace state is the
    RUNNING VITERBI LAYER (candidate edges of the last matched fix
    with accumulated costs — bounded by k), extended per arriving fix
    with the batch twin's exact cost model; each fix emits the
    CURRENT layer argmin.

    Semantics vs batch: this is forward-only online decoding — batch
    Viterbi may revise EARLIER assignments when later evidence
    arrives, a stream with emitted rows cannot.  On traces where the
    batch backtrace agrees with the per-layer argmins (the common
    unambiguous case — pytest pins it on the parallel-roads fixture,
    outlier included) stream == batch row for row.  Late fixes
    (seq below the trace's high-water mark) are dropped, not
    retro-matched — split traces upstream if reordering matters.

    ``reorder_window=W`` (seq units) adds a bounded per-trace reorder
    buffer — the sorted-neighborhood replay discipline: an arriving
    fix is HELD (its top-k candidates stored in state) until the
    trace's high-water seq exceeds it by W, then flushed into the
    Viterbi layer in seq order.  A fix up to W seqs out of order is
    matched exactly where batch would put it (pytest pins
    stream == batch across shuffled microbatch arrival); one more
    than W late is still dropped.  State stays bounded: layer ≤ k,
    pending ≤ W·k rows between batches.  Emission lags the high
    water by W fixes (the streaming latency/completeness trade,
    chosen per deployment).

    ``stall_timeout_ms``: the reorder buffer flushes on high-water
    ADVANCE, so a trace that stops transmitting would hold its tail
    pending forever.  With a timeout set, a trace group that receives
    no data for that long (processing time) flushes its ENTIRE
    pending buffer in seq order — bounded emission latency for
    stalled traces; a fix arriving after the flush is late
    (seq ≤ last_seq) and drops, the documented reorder-window
    contract.  Engine semantics to know: with ProcessingTimeTimeout
    Spark schedules state-cleanup batches CONTINUOUSLY
    (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
    unconditionally true for this conf), so the drain happens by
    itself within ~the timeout — but the query never quiesces, so
    ``processAllAvailable()`` blocks forever on such queries: poll
    the sink (or use awaitTermination with a timeout) instead.
    """
    from entwiner_spark.functions.geo import point_linestring_distance_m
    from entwiner_spark.operators.spatial import M_PER_DEG, with_cells

    if cell_deg is None:
        cell_deg = 2.0 * max_dist_m / M_PER_DEG
    dlat = F.lit(max_dist_m / M_PER_DEG)
    dlon = F.lit(max_dist_m) / (
        F.lit(M_PER_DEG) * F.cos(F.radians(F.col(lat_col)))
    )
    p = with_cells(
        fixes,
        F.col(lon_col) - dlon,
        F.col(lon_col) + dlon,
        F.col(lat_col) - dlat,
        F.col(lat_col) + dlat,
        cell_deg,
    )
    line_cols = edges.select(
        F.col(edge_key),
        F.col("_u"),
        F.col("_v"),
        F.col(coords_col).alias("__coords"),
        F.array_min(
            F.transform(F.col(coords_col), lambda c: c[0])
        ).alias("_minx"),
        F.array_max(
            F.transform(F.col(coords_col), lambda c: c[0])
        ).alias("_maxx"),
        F.array_min(
            F.transform(F.col(coords_col), lambda c: c[1])
        ).alias("_miny"),
        F.array_max(
            F.transform(F.col(coords_col), lambda c: c[1])
        ).alias("_maxy"),
    )
    ln = with_cells(
        line_cols,
        F.col("_minx"),
        F.col("_maxx"),
        F.col("_miny"),
        F.col("_maxy"),
        cell_deg,
    )
    cand = (
        p.join(ln, ["cx", "cy"])
        .withColumn(
            "_dist",
            point_linestring_distance_m(
                F.col(lon_col), F.col(lat_col), F.col("__coords")
            ),
        )
        .filter(F.col("_dist") < F.lit(float(max_dist_m)))
        .select(trace_key, seq_col, edge_key, "_u", "_v", "_dist")
    )
    sig2 = float(sigma_m) ** 2
    adj_pen, jump_pen = float(trans_adjacent), float(trans_jump)
    out_cols = [trace_key, seq_col, edge_key, "_u", "_v", "snap_dist_m"]

    window = max(0, int(reorder_window))

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (
                last_seq,
                s_edges,
                s_us,
                s_vs,
                s_costs,
                hw,
                p_seqs,
                p_edges,
                p_us,
                p_vs,
                p_dists,
            ) = state.get
            layer = [
                {"e": e, "u": u, "v": v, "c": c}
                for e, u, v, c in zip(s_edges, s_us, s_vs, s_costs)
            ]
            pending = list(zip(p_seqs, p_edges, p_us, p_vs, p_dists))
        else:
            last_seq, layer, hw, pending = None, [], None, []
        timed_out = stall_timeout_ms is not None and state.hasTimedOut
        chunks = [] if timed_out else list(pdfs)
        if chunks:
            rows = pd.concat(chunks, ignore_index=True)
            # per-microbatch dedup of cell duplicates: min dist per
            # (seq, edge) — exact, a fix never spans batches
            rows = (
                rows.sort_values([seq_col, "_dist"])
                .drop_duplicates([seq_col, edge_key])
            )
            # buffer each arriving fix's top-k candidates
            for s, grp in rows.groupby(seq_col, sort=True):
                if last_seq is not None and s <= last_seq:
                    continue  # later than the reorder window allows
                grp = grp.sort_values(["_dist", edge_key]).head(
                    k_candidates
                )
                grp = grp.sort_values(edge_key)  # batch-twin DP order
                for r in grp.to_dict("records"):
                    pending.append(
                        (
                            int(s),
                            r[edge_key],
                            r["_u"],
                            r["_v"],
                            float(r["_dist"]),
                        )
                    )
                hw = int(s) if hw is None else max(hw, int(s))
            # cross-batch dedup: a DUPLICATE fix whose seq is still
            # pending (> last_seq) re-appends its candidates; keep the
            # min-dist row per (seq, edge) so the flushed Viterbi layer
            # matches the batch twin's (seq, edge) dedup exactly
            if pending:
                best_pend: dict = {}
                for t in pending:
                    k2 = (t[0], t[1])
                    if k2 not in best_pend or t[4] < best_pend[k2][4]:
                        best_pend[k2] = t
                pending = list(best_pend.values())
        out = []
        if pending:
            pending.sort(key=lambda t: (t[0], t[1]))
            # stalled-trace flush: on timeout, drain the whole buffer
            flush_upto = hw if timed_out else hw - window
            keep = []
            cur_s, grp_rows = None, []

            def extend(s, cand_rows):
                nonlocal layer, last_seq
                new_layer = []
                for _s, e, u, v, d in cand_rows:
                    emis = (d * d) / sig2
                    if not layer:
                        new_layer.append(
                            {"e": e, "u": u, "v": v, "c": emis, "d": d}
                        )
                        continue
                    bc = None
                    for pr in layer:
                        if pr["e"] == e:
                            t = 0.0
                        elif {pr["u"], pr["v"]} & {u, v}:
                            t = adj_pen
                        else:
                            t = jump_pen
                        c = pr["c"] + t
                        if bc is None or c < bc:
                            bc = c
                    new_layer.append(
                        {"e": e, "u": u, "v": v, "c": bc + emis, "d": d}
                    )
                if not new_layer:
                    return
                layer = new_layer
                last_seq = s
                best = min(
                    range(len(layer)), key=lambda i: (layer[i]["c"], i)
                )
                b = layer[best]
                out.append(
                    {
                        trace_key: key[0],
                        seq_col: s,
                        edge_key: b["e"],
                        "_u": b["u"],
                        "_v": b["v"],
                        "snap_dist_m": float(b["d"]),
                    }
                )

            for row in pending:
                s = row[0]
                if s > flush_upto:
                    keep.append(row)
                    continue
                if cur_s is not None and s != cur_s:
                    extend(cur_s, grp_rows)
                    grp_rows = []
                cur_s = s
                grp_rows.append(row)
            if grp_rows:
                extend(cur_s, grp_rows)
            pending = keep
        if last_seq is not None or pending:
            state.update(
                (
                    None if last_seq is None else int(last_seq),
                    [x["e"] for x in layer],
                    [x["u"] for x in layer],
                    [x["v"] for x in layer],
                    [float(x["c"]) for x in layer],
                    None if hw is None else int(hw),
                    [int(t[0]) for t in pending],
                    [t[1] for t in pending],
                    [t[2] for t in pending],
                    [t[3] for t in pending],
                    [float(t[4]) for t in pending],
                )
            )
            # (re)arm the stall clock only while something is pending;
            # a drained trace needs no wake-up
            if stall_timeout_ms is not None and pending:
                state.setTimeoutDuration(int(stall_timeout_ms))
        yield pd.DataFrame(out, columns=out_cols)

    tk_t = fixes.schema[trace_key].dataType.simpleString()
    seq_t = fixes.schema[seq_col].dataType.simpleString()
    ek_t = edges.schema[edge_key].dataType.simpleString()
    u_t = edges.schema["_u"].dataType.simpleString()
    return cand.groupBy(trace_key).applyInPandasWithState(
        update,
        outputStructType=(
            f"{trace_key} {tk_t}, {seq_col} {seq_t}, {edge_key} {ek_t}, "
            f"_u {u_t}, _v {u_t}, snap_dist_m double"
        ),
        stateStructType=(
            f"last_seq long, edges array<{ek_t}>, us array<{u_t}>, "
            f"vs array<{u_t}>, costs array<double>, hw long, "
            f"p_seqs array<long>, p_edges array<{ek_t}>, "
            f"p_us array<{u_t}>, p_vs array<{u_t}>, "
            f"p_dists array<double>"
        ),
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if stall_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
