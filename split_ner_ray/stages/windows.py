"""Event-time windows over ordered logs (tumbling + session).

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


def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800):
    """Session windows: per key, a new session starts when the gap to the
    previous event exceeds ``gap_s``. Emits one row per session:
    (key, session_idx, n_events, start_ts, end_ts, duration_s).
    """

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col)
        ts = g[ts_col]
        new_session = (ts.diff().dt.total_seconds() > gap_s).fillna(True)
        sid = new_session.cumsum() - 1
        out = g.groupby(sid.to_numpy()).agg(
            n_events=(ts_col, "size"), start_ts=(ts_col, "min"), end_ts=(ts_col, "max")
        )
        out = out.reset_index(drop=True)
        out.insert(0, key_col, g[key_col].iloc[0])
        out.insert(1, "session_idx", np.arange(len(out), dtype=np.int64))
        out["duration_s"] = (
            (out["end_ts"] - out["start_ts"]).dt.total_seconds().astype("int64")
        )
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
