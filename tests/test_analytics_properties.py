"""Brute-force property tests for the round-3 analytics kernels: the
distributed results must equal a trivially-correct per-user Python
reference on randomized small inputs (same spirit as the merge-property
suite -- SURVEY.md section 5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def random_events_dir(tmp_path):
    """A tiny randomized events table written where the pipelines expect
    it (seeded: deterministic across runs)."""
    rng = np.random.default_rng(20260817)
    n = 4000
    users = rng.integers(0, 37, size=n).astype(np.int64)
    ts = rng.integers(1_700_000_000_000_000,
                      1_700_000_000_000_000 + 90 * 86_400_000_000,
                      size=n).astype(np.int64)
    types = np.array(["view", "click", "purchase", "error", "signup"])[
        rng.integers(0, 5, size=n)]
    value = rng.normal(100, 30, size=n)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array(types.tolist(), type=pa.string()),
        "value": pa.array(value, type=pa.float64()),
        "props": pa.array([f'{{"k": {int(v)}}}' for v in
                           rng.integers(0, 100, size=n)],
                          type=pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path), t


def test_funnel_matches_bruteforce(ray_session, random_events_dir):
    from p2pddsketch_ray.pipelines.temporal import funnel_counts
    sf, t = random_events_dir
    got = funnel_counts(sf).to_pandas().iloc[0]

    df = t.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "ts_us", "event_id"])
    steps = ("view", "click", "purchase")
    counts = [0, 0, 0]
    for _, g in df.groupby("user_id"):
        pos = -1
        rows = list(zip(g["event_type"], range(len(g))))
        for si, step in enumerate(steps):
            nxt = next((i for et, i in rows if et == step and i > pos),
                       None)
            if nxt is None:
                break
            counts[si] += 1
            pos = nxt
    assert [got["n_step1"], got["n_step2"], got["n_step3"]] == counts


def test_moving_window_matches_pandas_rolling(ray_session,
                                              random_events_dir):
    from p2pddsketch_ray.pipelines.temporal import user_moving_window
    sf, t = random_events_dir
    got = (user_moving_window(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))

    df = t.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df["units"] = np.floor(df["value"] * 1e6 + 0.5).astype("int64")
    df = df.sort_values(["user_id", "ts_us", "event_id"])
    ref = (df.groupby("user_id")["units"]
           .rolling(4, min_periods=1).sum().reset_index(level=0))
    df["moving_ref"] = ref["units"].astype("int64")
    merged = got.merge(df[["event_id", "moving_ref"]], on="event_id")
    assert (merged["moving_units"] == merged["moving_ref"]).all()


def test_active_user_counts_matches_bruteforce(ray_session,
                                               random_events_dir):
    from p2pddsketch_ray.pipelines.temporal import active_user_counts
    sf, t = random_events_dir
    got = active_user_counts(sf).to_pandas()

    df = t.to_pandas()
    df["day"] = df["ts"].astype("int64") // 86_400_000_000
    pairs = df[["user_id", "day"]].drop_duplicates()
    mn, mx = pairs["day"].min(), pairs["day"].max()
    rows = []
    for d in range(mn, mx + 1):
        dau = pairs[pairs.day == d]["user_id"].nunique()
        wau = pairs[(pairs.day >= d - 6)
                    & (pairs.day <= d)]["user_id"].nunique()
        if wau:
            rows.append((d * 86_400, dau, wau))
    ref = pd.DataFrame(rows, columns=["day_start", "dau", "wau"])
    assert got.equals(ref)


def test_cohort_retention_matches_bruteforce(ray_session,
                                             random_events_dir):
    from p2pddsketch_ray.pipelines.temporal import cohort_retention
    sf, t = random_events_dir
    got = (cohort_retention(sf).to_pandas()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))

    df = t.to_pandas()
    df["wk"] = df["ts"].astype("int64") // 604_800_000_000
    pairs = df[["user_id", "wk"]].drop_duplicates()
    first = pairs.groupby("user_id")["wk"].min().rename("cw")
    j = pairs.join(first, on="user_id")
    ref = (j.assign(cohort_week=j["cw"] * 604_800,
                    week_offset=j["wk"] - j["cw"])
           .groupby(["cohort_week", "week_offset"]).size()
           .rename("n_users").reset_index()
           .astype({"cohort_week": "int64", "week_offset": "int64",
                    "n_users": "int64"}))
    assert got.equals(ref)
