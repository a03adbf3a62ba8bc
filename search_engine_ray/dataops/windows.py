"""Stream-shaped operators over the ordered `events` log.

Ray Data has no event-time windows/watermarks; per the guide, the input is
treated as a partitioned ordered log: a vectorized partial aggregate per
batch keyed by (key, window) followed by one small groupby merge — the
classic two-phase combiner, so the shuffle moves one row per (key, window,
batch), not one per event.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def tumbling_window_agg(
    ds: ray.data.Dataset,
    window_seconds: int = 3600,
    key_column: str = "event_type",
    ts_column: str = "ts",
    value_column: str = "value",
) -> ray.data.Dataset:
    """Count/sum/min/max of value per (key, tumbling window).

    Window start is epoch-aligned: floor(epoch_us / window_us) * window.
    """
    window_us = window_seconds * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch[ts_column].cast(pa.int64()), dtype=np.int64)
        win = (ts // window_us) * window_us
        df = pd.DataFrame(
            {
                "key": batch[key_column].to_pylist(),
                "window_start_us": win,
                "value": np.asarray(batch[value_column], dtype=np.float64),
            }
        )
        agg = df.groupby(["key", "window_start_us"], as_index=False).agg(
            n=("value", "size"),
            sum_value=("value", "sum"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )
        # strip pandas schema metadata: dict-typed metadata defeats Ray's
        # block-schema dedup (hash warning) on every shuffle batch
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["key", "window_start_us"]).aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_value", alias_name="sum_value"),
        Min("min_value", alias_name="min_value"),
        Max("max_value", alias_name="max_value"),
    )


def hopping_window_agg(
    ds: ray.data.Dataset,
    window_seconds: int = 3600,
    hop_seconds: int = 900,
    key_column: str = "event_type",
    ts_column: str = "ts",
    value_column: str = "value",
) -> ray.data.Dataset:
    """Count/sum per (key, HOPPING window): windows of ``window_seconds``
    starting every ``hop_seconds`` (window must be a multiple of hop), so
    each event belongs to window/hop overlapping windows.

    Same two-phase combiner as the tumbling case; the explode factor
    (window/hop replicated PARTIAL rows, not events) is applied inside the
    per-batch kernel, so the shuffle still moves one row per (key, window,
    batch)."""
    if window_seconds % hop_seconds:
        raise ValueError("window_seconds must be a multiple of hop_seconds")
    window_us = window_seconds * 1_000_000
    hop_us = hop_seconds * 1_000_000
    k = window_seconds // hop_seconds

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch[ts_column].cast(pa.int64()), dtype=np.int64)
        n = len(ts)
        vals = np.asarray(batch[value_column], dtype=np.float64)
        keys = np.asarray(batch[key_column].to_pylist(), dtype=object)
        # an event at t is in windows starting at floor(t/hop)*hop - j*hop
        # for j = 0..k-1 where the start is still <= t and t < start+window
        base = (ts // hop_us) * hop_us
        starts = base[None, :] - (np.arange(k, dtype=np.int64) * hop_us)[:, None]
        df = pd.DataFrame(
            {
                "key": np.tile(keys, k),
                "window_start_us": starts.ravel(),
                "value": np.tile(vals, k),
            }
        )
        agg = df.groupby(["key", "window_start_us"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        # strip pandas schema metadata: dict-typed metadata defeats Ray's
        # block-schema dedup (hash warning) on every shuffle batch
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["key", "window_start_us"]).aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_value", alias_name="sum_value"),
    )


def asof_join_events(
    ds: ray.data.Dataset,
    left_type: str,
    right_type: str,
    key_column: str = "user_id",
    ts_column: str = "ts",
) -> ray.data.Dataset:
    """As-of join within the ordered log: for every `left_type` event,
    attach the most recent `right_type` event AT OR BEFORE it for the same
    key (e.g. each purchase joined to the user's latest prior click).

    Partitioning assumption (stated per the guide): ALL events of a key are
    co-located by the groupby; within-group order is established by the
    sort here; `pd.merge_asof(direction="backward")` does the window walk.
    Events with no prior right-side match keep a null `asof_ts`.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_column, "event_id"])
        left = g[g["event_type"] == left_type]
        right = g[g["event_type"] == right_type]
        if left.empty:
            return pd.DataFrame(
                {key_column: [], "event_id": [], "ts_us": [], "asof_event_id": [], "asof_ts_us": []}
            )
        lt = left[ts_column].astype("int64").to_numpy()
        if right.empty:
            idx = np.full(len(left), -1)
        else:
            rt = right[ts_column].astype("int64").to_numpy()
            idx = np.searchsorted(rt, lt, side="right") - 1
        out = pd.DataFrame(
            {
                key_column: left[key_column].to_numpy(),
                "event_id": left["event_id"].to_numpy(),
                "ts_us": lt,
            }
        )
        rid = right["event_id"].to_numpy() if not right.empty else np.empty(0, np.int64)
        rts = right[ts_column].astype("int64").to_numpy() if not right.empty else np.empty(0, np.int64)
        out["asof_event_id"] = np.where(idx >= 0, rid[np.maximum(idx, 0)], -1)
        out["asof_ts_us"] = np.where(idx >= 0, rts[np.maximum(idx, 0)], -1)
        return out

    return ds.groupby(key_column).map_groups(per_key, batch_format="pandas")


def sessionize(
    ds: ray.data.Dataset,
    gap_seconds: int = 1800,
    key_column: str = "user_id",
    ts_column: str = "ts",
) -> ray.data.Dataset:
    """Session windows per key: sort within group by ts, break on gaps.

    Ordering assumption: one group holds ALL events of a key (the groupby
    guarantees it); within-group order is established by the sort here.
    """
    gap_us = gap_seconds * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_column)
        ts = g[ts_column].astype("int64").to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_session) - 1
        out = pd.DataFrame({"sid": sid, "ts": ts})
        agg = out.groupby("sid").agg(
            session_start_us=("ts", "min"),
            session_end_us=("ts", "max"),
            n_events=("ts", "size"),
        )
        agg[key_column] = g[key_column].iloc[0]
        return agg.reset_index(drop=True)[
            [key_column, "session_start_us", "session_end_us", "n_events"]
        ]

    return ds.groupby(key_column).map_groups(sessions, batch_format="pandas")
