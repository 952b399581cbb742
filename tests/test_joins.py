"""Join machinery tests: hash join, as-of join, running window."""

import pandas as pd

from ocr_ray.stages import joins


def test_hash_join(ray_session):
    import ray.data

    left = ray.data.from_items(
        [{"k": i % 3, "lv": i} for i in range(9)]
    )
    right = ray.data.from_items([{"rk": 0, "rv": "a"}, {"rk": 1, "rv": "b"}])
    out = joins.hash_join(left, right, on="k", right_on="rk", num_partitions=4).to_pandas()
    assert len(out) == 6  # k in {0,1} matches 3 rows each
    assert set(out["rv"]) == {"a", "b"}


def test_asof_join(ray_session):
    import ray.data

    orders = ray.data.from_items(
        [
            {"o_id": 1, "cust": 1, "od": pd.Timestamp("2021-01-10")},
            {"o_id": 2, "cust": 1, "od": pd.Timestamp("2021-01-01")},
            {"o_id": 3, "cust": 2, "od": pd.Timestamp("2021-01-05")},
            {"o_id": 4, "cust": 9, "od": pd.Timestamp("2021-01-05")},  # no events
        ]
    )
    events = ray.data.from_items(
        [
            {"u": 1, "ts": pd.Timestamp("2021-01-05")},
            {"u": 1, "ts": pd.Timestamp("2021-01-09")},
            {"u": 2, "ts": pd.Timestamp("2021-01-07")},  # after order 3
        ]
    )
    out = joins.asof_join(
        orders, events,
        left_key="cust", left_ts="od", left_keep=["o_id"],
        right_key="u", right_ts="ts", out_col="last_ts",
    ).to_pandas().set_index("o_id")
    assert out.loc[1, "last_ts"] == pd.Timestamp("2021-01-09")
    assert pd.isna(out.loc[2, "last_ts"])  # no event before 01-01
    assert pd.isna(out.loc[3, "last_ts"])  # event is after the order
    assert pd.isna(out.loc[4, "last_ts"])  # customer has no events


def test_running_window(ray_session):
    import ray.data

    ds = ray.data.from_items(
        [
            {"k": 1, "t": 2, "id": 1, "v": 10.0},
            {"k": 1, "t": 1, "id": 2, "v": 5.0},
            {"k": 2, "t": 1, "id": 3, "v": 7.0},
            {"k": 1, "t": 2, "id": 0, "v": 1.0},  # ts tie -> id breaks it
        ]
    )
    out = joins.running_window(
        ds, key="k", order_by=["t", "id"], value="v", out_col="run"
    ).to_pandas().set_index("id")
    assert out.loc[2, "run"] == 5.0
    assert out.loc[0, "run"] == 6.0   # 5 + 1 (id 0 before id 1 at t=2)
    assert out.loc[1, "run"] == 16.0
    assert out.loc[3, "run"] == 7.0
