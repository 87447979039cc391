"""Gap-based sessionization — training-data assembly over event streams.

Groups an event table into per-user sessions split at inactivity gaps
(the standard clickstream/conversation-assembly operator): one Ray Data
``groupby(user).map_groups`` exchange, then a vectorized per-user pass
(sort by (ts, id), diff, cumsum — no Python loop over rows).

Scale notes: the groupby is the one all-to-all shuffle and partitions by
user, so each group is one user's timeline (bounded in practice; a
pathological single hot user is the caller's signal to pre-filter by
time window — sessions need the contiguous timeline, so key salting
cannot apply). Output is per-session rows, ~orders of magnitude smaller
than the input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _sessionize_user(df: pd.DataFrame, *, user_col: str, ts_col: str,
                     id_col: str, gap_us: int) -> pd.DataFrame:
    df = df.sort_values([ts_col, id_col], kind="stable")
    ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    brk = np.concatenate(([0], (np.diff(ts) > gap_us).astype(np.int64)))
    sess = brk.cumsum()
    g = df.assign(_sess=sess).groupby("_sess", sort=True)
    out = pd.DataFrame({
        user_col: df[user_col].iloc[0],
        "session_idx": np.asarray(sorted(g.groups), np.int64),
        "n_events": g.size().to_numpy().astype(np.int64),
        "start_ts": g[ts_col].min().to_numpy(),
        "end_ts": g[ts_col].max().to_numpy(),
    })
    return out


def sessionize(ds, *, user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", gap_secs: float = 1800.0):
    """Events Dataset -> per-session rows (user, session_idx, n_events,
    start_ts, end_ts). A new session starts when the gap to the previous
    event of the same user exceeds ``gap_secs``; ties on ts are broken
    by ``id_col`` so the split points are deterministic."""
    gap_us = int(gap_secs * 1_000_000)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        return _sessionize_user(df, user_col=user_col, ts_col=ts_col,
                                id_col=id_col, gap_us=gap_us)

    return ds.groupby(user_col).map_groups(per_user, batch_format="pandas")
