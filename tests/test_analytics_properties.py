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


def test_user_event_sequences_large_offset_branch(ray_session,
                                                  monkeypatch):
    """Force the LargeStringArray path (total bytes > threshold) and
    assert output is identical to the int32-offset path."""
    import p2pddsketch_ray.pipelines.temporal as T
    sf = "/root/testdata/sf0.001"
    small = (T.user_event_sequences(sf).to_pandas()
             .sort_values("user_id").reset_index(drop=True))
    monkeypatch.setattr(T, "_SEQ_SMALL_OFFSET_MAX", 10)
    large = (T.user_event_sequences(sf).to_pandas()
             .sort_values("user_id").reset_index(drop=True))
    assert large.equals(small)


def test_kmv_merge_order_bit_identity_hypothesis():
    from hypothesis import given, settings, strategies as st
    from p2pddsketch_ray.sketches.kmv import KMVSketch

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.integers(min_value=-2**40, max_value=2**40),
                    min_size=1, max_size=400),
           st.integers(min_value=2, max_value=6),
           st.randoms(use_true_random=False))
    def prop(vals, parts, rnd):
        arr = np.asarray(vals, dtype=np.int64)
        chunks = np.array_split(arr, parts)
        sketches = []
        for c in chunks:
            s = KMVSketch(32)
            s.add_batch(c)
            sketches.append(s)
        rnd.shuffle(sketches)
        merged = sketches[0]
        for s in sketches[1:]:
            merged = merged.merge(s)
        bulk = KMVSketch(32)
        bulk.add_batch(arr)
        assert np.array_equal(merged.mins, bulk.mins)
        assert merged.to_row()["mins"] == bulk.to_row()["mins"]

    prop()


def test_connected_components_stress_random_graph(ray_session):
    import ray.data
    from p2pddsketch_ray.pipelines.components import connected_components

    rng = np.random.default_rng(99)
    n, ne = 2000, 5000
    e = rng.integers(0, n, size=(ne, 2)).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"a": e[:, 0], "b": e[:, 1]}))
    nodes = ray.data.from_arrow(
        pa.table({"node": np.arange(n, dtype=np.int64)}))
    got = (connected_components(edges, nodes).to_pandas()
           .sort_values("node").reset_index(drop=True))

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in e.tolist():
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    lab = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            lab[x] = m
    assert len(got) == n
    assert all(lab[int(r.node)] == int(r.component)
               for r in got.itertuples())


def test_dp_noisy_counts_noise_is_laplace_shaped(ray_session):
    from p2pddsketch_ray.pipelines.relational import dp_noisy_counts
    sf = "/root/testdata/sf0.001"
    t = dp_noisy_counts(sf).to_pydict()
    # deterministic across calls (seeded release)
    t2 = dp_noisy_counts(sf).to_pydict()
    assert t == t2
    # noise magnitude: |Lap(b=10)| < b * 50 with overwhelming margin
    for ex, noisy in zip(t["n_exact"], t["n_noisy"]):
        assert abs(noisy - ex) < 500.0
    # different seed tag -> different draw
    t3 = dp_noisy_counts(sf, seed_tag="other").to_pydict()
    assert t3["n_noisy"] != t["n_noisy"]


def test_huber_location_between_quartiles_and_robust(ray_session):
    import numpy as np
    import pyarrow.parquet as pq
    from p2pddsketch_ray.pipelines.relational import huber_location_by_flag
    sf = "/root/testdata/sf0.001"
    got = huber_location_by_flag(sf).to_pydict()
    li = pq.read_table(f"{sf}/lineitem.parquet",
                       columns=["l_returnflag", "l_extendedprice"])
    flag = np.asarray(li["l_returnflag"].to_pylist())
    cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    for f, hub, mean_c in zip(got["l_returnflag"], got["huber_cents"],
                              got["mean_cents"]):
        x = cents[flag == f]
        assert np.quantile(x, 0.2) <= hub <= np.quantile(x, 0.8)
    # with the knee beyond the data range every weight is 1 and the
    # IRLS fixed point IS the integer mean
    wide = huber_location_by_flag(sf, k_cents=10**10).to_pydict()
    assert wide["huber_cents"] == wide["mean_cents"]


def test_brier_decomposition_terms_consistent(ray_session):
    from p2pddsketch_ray.pipelines.inference import brier_decomposition
    sf = "/root/testdata/sf0.001"
    t = brier_decomposition(sf).to_pydict()
    import pyarrow.parquet as pq
    n_docs = pq.read_table(f"{sf}/documents.parquet",
                           columns=["doc_id"]).num_rows
    assert sum(t["n_docs"]) == n_docs
    for i in range(len(t["bin"])):
        assert 0 <= t["mean_p_micro"][i] <= 1_000_000
        assert 0 <= t["pos_rate_micro"][i] <= 1_000_000
        assert t["rel_contrib"][i] >= 0 and t["res_contrib"][i] >= 0
        # sse >= n * (calibration gap)^2 (Jensen)
        gap = t["mean_p_micro"][i] - t["pos_rate_micro"][i]
        assert t["sse_micro2"][i] >= t["n_docs"][i] * gap * gap \
            - 2_000_000 * t["n_docs"][i]
