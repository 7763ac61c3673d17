"""Event-time windows over ordered logs (tumbling + sliding + session).

Ray Data has no native event-time windowing; per the engine design the
input is treated as a partitioned log: window membership is a pure column
(tumbling) or derived per key from sorted timestamps (session) — the
groupby co-locates a key's events, the per-group function orders by ts.
Ordering assumption: windows are computed per key AFTER the shuffle, so
global row order is irrelevant (documented contract, SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def add_tumbling_window(ds, ts_col: str = "ts", period_s: int = 3600,
                        out_col: str = "window_start"):
    """Add the tumbling-window start timestamp (epoch-aligned)."""

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = batch[ts_col].dt.floor(f"{period_s}s")
        return batch

    return ds.map_batches(assign, batch_format="pandas")


def sliding_window_agg(ds, *, ts_col: str = "ts", width_s: int = 3600,
                       slide_s: int = 900, value_col: str | None = None):
    """Sliding (hopping) event-time window aggregate: windows of
    ``width_s`` starting at every epoch-aligned multiple of ``slide_s``;
    emits per window (ws_s epoch-seconds, n, [sum_v]).

    ``width_s`` must be a multiple of ``slide_s``, so every event belongs
    to exactly ``width/slide`` windows — the expansion is a uniform numpy
    repeat/tile, then a PER-BATCH partial aggregate collapses the m-times
    blowup to at most the distinct windows the batch touches BEFORE the
    shuffle; the final pass is one bucketed int-key hash aggregate."""
    if width_s % slide_s:
        raise ValueError("width_s must be a multiple of slide_s")
    m = width_s // slide_s

    from .relational import hash_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        # unit-safe epoch seconds (parquet may arrive as datetime64[us],
        # pandas literals as [ns] — an int64 view would be unit-dependent)
        t_s = batch[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)
        base = t_s // slide_s * slide_s
        ws = np.repeat(base, m) - np.tile(
            np.arange(m, dtype=np.int64) * slide_s, n
        )
        cols = {"ws_s": ws}
        if value_col is not None:
            cols["__v"] = np.repeat(batch[value_col].to_numpy(), m)
        df = pd.DataFrame(cols)
        spec = {"n": ("ws_s", "size")}
        if value_col is not None:
            spec["sum_v"] = ("__v", "sum")
        return df.groupby("ws_s", as_index=False).agg(**spec)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        spec = {"n": ("n", "sum")}
        if value_col is not None:
            spec["sum_v"] = ("sum_v", "sum")
        out = g.groupby("ws_s", as_index=False).agg(**spec)
        out["n"] = out["n"].astype("int64")
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    return hash_aggregate(partials, ["ws_s"], final)


def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800):
    """Session windows: per key, a new session starts when the gap to the
    previous event exceeds ``gap_s``. Emits one row per session:
    (key, session_idx, n_events, start_ts, end_ts, duration_s).
    """

    from .relational import hash_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized pandas pass sessionizes every key in the bucket
        # (no per-key UDF dispatch — the 10^8-user path): sort by (key, ts),
        # session breaks at key changes or gaps, one groupby over break ids.
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        ts = g[ts_col]
        same_key = g[key_col].eq(g[key_col].shift())
        gap_ok = ts.diff().dt.total_seconds() <= gap_s
        new_session = ~(same_key & gap_ok)
        sid = new_session.cumsum()
        out = g.groupby(sid.to_numpy()).agg(
            **{
                key_col: (key_col, "first"),
                "n_events": (ts_col, "size"),
                "start_ts": (ts_col, "min"),
                "end_ts": (ts_col, "max"),
            }
        ).reset_index(drop=True)
        out.insert(
            1, "session_idx",
            out.groupby(key_col).cumcount().astype("int64"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["duration_s"] = (
            (out["end_ts"] - out["start_ts"]).dt.total_seconds().astype("int64")
        )
        return out

    return hash_aggregate(ds, [key_col], per_bucket)


def running_agg(ds, *, key_col: str, order_cols: list[str], value_col: str,
                num_buckets: int = 64):
    """Per-key running aggregates (the SUM/ROW_NUMBER OVER (PARTITION BY
    key ORDER BY ...) window shape): adds ``rn`` (1-based rank) and
    ``run_<value_col>`` (cumulative sum) to every input row.

    One bucketed shuffle co-locates each key's history; per bucket, a
    single vectorized sort + groupby.cumsum/cumcount pass handles every
    key in the bucket (no per-key dispatch). Include a unique tie-break
    column in ``order_cols`` for determinism. Partitioning assumption
    (same as sessionize): one key's full history fits in a bucket worker
    — segment a pathological key upstream if it exceeds worker memory.
    """
    from .relational import hash_aggregate

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        grp = g.groupby(key_col, sort=False)
        g = g.assign(
            rn=(grp.cumcount() + 1).astype("int64"),
            **{f"run_{value_col}": grp[value_col].cumsum()},
        )
        return g

    return hash_aggregate(ds, [key_col], per_bucket, num_buckets=num_buckets)


def debounce(ds, *, key_cols: list[str], ts_col: str = "ts",
             gap_us: int = 3_600_000_000, tie_cols: list[str] | None = None,
             num_buckets: int = 64):
    """Windowed dedup / event debouncing: within each key, keep only the
    FIRST event of each burst, where rows at most ``gap_us``
    microseconds after their predecessor chain into the same burst —
    exactly sessionize's session rule, kept rows = session heads. (The
    alternative contract — drop anything within gap of the previous KEPT
    row — is stateful-sequential and not window-SQL-expressible; the
    burst-head rule is the one telemetry/training-event feeds usually
    want and is mirrored exactly by a LAG filter in SQL.)

    One bucketed shuffle co-locates each key's history; per bucket, ONE
    vectorized sort + shifted-compare pass covers every key (no per-key
    dispatch). Ties on ts break by ``tie_cols`` for determinism. Same
    partitioning assumption as sessionize."""
    from .relational import hash_aggregate

    order = [ts_col] + (tie_cols or [])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols + order, kind="mergesort")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        # new key run?
        karr = [g[c].to_numpy() for c in key_cols]
        newk = np.zeros(len(g), dtype=bool)
        newk[0] = True
        for a in karr:
            newk[1:] |= a[1:] != a[:-1]
        prev = np.empty(len(g), dtype=np.int64)
        prev[0] = np.iinfo(np.int64).min // 2
        prev[1:] = ts[:-1]
        # break at STRICTLY greater than gap — the same boundary rule as
        # sessionize (equal-gap events chain), so session counts and
        # burst-head counts agree on boundary data
        gap_new = newk | ((ts - prev) > gap_us)
        # keep burst heads: a row is kept iff it starts a session under
        # the same gap rule sessionize uses (head of each burst)
        return g[gap_new]

    return hash_aggregate(ds, key_cols, per_bucket, num_buckets=num_buckets)
