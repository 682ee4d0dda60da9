"""Windowed aggregation over an event stream table (events: event_id, ts,
user_id, event_type, value, props).

Ray Data has no event-time windows; tumbling windows are expressed as a keyed
aggregate over (user_id, window_start) with the standard partial->final shape:
per-batch pre-aggregation inside ``map_batches`` (combiner) so the shuffle
moves one row per (user, window) per batch, not one per event.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

US_PER_SEC = 1_000_000


def tumbling_window_agg(ds: ray.data.Dataset, window_sec: int = 3600) -> ray.data.Dataset:
    """count + sum(value) per (user_id, tumbling window)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["ts"].combine_chunks()
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[col.type.unit]
        ts = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // (window_sec * per_sec)) * window_sec  # window start, epoch sec
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "window_start": win,
                "value": batch["value"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["user_id", "window_start"], sort=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        partials.groupby(["user_id", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
    )


def sessionize(ds: ray.data.Dataset, gap_sec: int = 1800) -> ray.data.Dataset:
    """Session windows per user (new session when gap > gap_sec).

    Keyed ``groupby(user_id).map_groups``: each group sorts its events by ts
    and cuts sessions — the per-user event list must fit one task (documented
    partitioning assumption; salt by day for pathological users at scale).
    """

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        # normalize to seconds regardless of stored resolution
        ts = pd.to_datetime(g["ts"]).astype("datetime64[ns]").astype("int64").to_numpy() // 10**9
        new_sess = np.concatenate([[True], np.diff(ts) > gap_sec])
        sess = np.cumsum(new_sess) - 1
        out = g.assign(session_idx=sess).groupby("session_idx").agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
            sum_value=("value", "sum"),
        ).reset_index(drop=True)
        return out

    return ds.groupby("user_id").map_groups(cut, batch_format="pandas")


def funnel(
    ds: ray.data.Dataset,
    steps: tuple = ("view", "click", "purchase"),
    horizon_sec: int | None = 86400,
) -> ray.data.Dataset:
    """Ordered funnel analysis per user: greedy earliest-completion chain —
    t1 = the user's first ``steps[0]`` event, t_i = the first ``steps[i]``
    event strictly after t_{i-1}; ``n_steps`` counts how far the chain got
    and ``converted`` requires the full chain within ``horizon_sec`` of t1
    (None = unbounded). The same greedy-chain shape as the sloppy-phrase
    matcher, over event streams instead of positions — and exactly
    SQL-expressible, so the driver twin is a nested min-over-filter chain.

    Keyed ``groupby(user_id).map_groups`` (the sessionize partitioning
    assumption: one user's events fit a task; salt by day at scale). Only
    users with at least one first-step event are emitted."""

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        t = None
        n = 0
        t0 = None
        for step in steps:
            sel = ts[(et == step) & ((ts > t) if t is not None else np.ones(len(ts), bool))]
            if len(sel) == 0:
                break
            t = int(sel.min())
            if t0 is None:
                t0 = t
            n += 1
        if n == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "n_steps": pd.Series(dtype=np.int64),
                                 "converted": pd.Series(dtype=bool)})
        conv = n == len(steps) and (
            horizon_sec is None or (t - t0) <= horizon_sec * 1_000_000
        )
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n_steps": [np.int64(n)],
            "converted": [bool(conv)],
        })

    return ds.groupby("user_id").map_groups(chain, batch_format="pandas")
