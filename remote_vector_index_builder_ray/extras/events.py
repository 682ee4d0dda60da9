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


def retention(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Weekly retention cohorts: cohort = a user's first active week
    (Monday-floored, matching SQL date_trunc('week')); for every later
    active week the user counts into (cohort_week, offset_weeks). Returns
    (cohort_week, offset_weeks, n_users) — the classic retention triangle.

    Shape: one map pass dedups (user, week) pairs per batch, one
    ``groupby(user_id).map_groups`` computes each user's cohort + offsets
    (the shuffle moves (user_id, week) int pairs only), and the
    (cohorts x offsets) result is driver-small by construction."""

    def pairs(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        days = batch["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        days = days.astype("datetime64[D]").astype(np.int64)
        # Monday floor: 1970-01-01 was a Thursday (weekday 3, Monday=0)
        week = days - (days + 3) % 7
        key = np.unique(uid.astype(np.int64) * np.int64(1 << 20) + week)
        return pa.table({
            "user_id": pa.array(key >> np.int64(20), type=pa.int64()),
            "week": pa.array(key & np.int64((1 << 20) - 1), type=pa.int64()),
        })

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        w = np.unique(g["week"].to_numpy(np.int64))
        cw = int(w.min())
        return pd.DataFrame({
            "cohort_week": np.full(len(w), cw, dtype=np.int64),
            "offset_weeks": (w - cw) // 7,
        })

    uw = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    per_user = uw.groupby("user_id").map_groups(offsets, batch_format="pandas")

    def count(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["cohort_week", "offset_weeks"]).aggregate([([], "count_all")])
        return t.rename_columns(["cohort_week", "offset_weeks", "n"])

    out = per_user.map_batches(count, batch_format="pyarrow").to_pandas()
    g = (out.groupby(["cohort_week", "offset_weeks"], sort=True)["n"].sum()
         .reset_index().rename(columns={"n": "n_users"}))
    g["cohort_week"] = (g["cohort_week"].to_numpy(np.int64)
                        .astype("datetime64[D]").astype("datetime64[us]"))
    import ray

    return ray.data.from_pandas(g.astype({"offset_weeks": np.int64,
                                          "n_users": np.int64}))


def hopping_window_agg(
    ds: ray.data.Dataset,
    window_sec: int = 3600,
    hop_sec: int = 900,
) -> ray.data.Dataset:
    """count + sum(value) per (user_id, HOPPING window): overlapping windows
    of ``window_sec`` advancing by ``hop_sec`` (must divide evenly) — every
    event replicates into window_sec/hop_sec windows inside the per-batch
    combiner (the replication happens on the tiny partial rows, never on a
    shuffle of raw events), then the same associative groupby reduce as the
    tumbling window."""
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    n_w = window_sec // hop_sec
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["ts"].combine_chunks()
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[col.type.unit]
        ts = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = ts // (hop_sec * per_sec)  # hop-unit index of each event
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        offs = np.arange(n_w, dtype=np.int64)
        win = (base[:, None] - offs[None, :]) * hop_sec  # (n, n_w) starts
        rep_uid = np.repeat(uid, n_w)
        rep_val = np.repeat(val, n_w)
        flat = win.reshape(-1)
        keep = flat >= 0
        df = pd.DataFrame({
            "user_id": rep_uid[keep],
            "window_start": flat[keep],
            "value": rep_val[keep],
        })
        g = df.groupby(["user_id", "window_start"], sort=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        partials.groupby(["user_id", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
    )
