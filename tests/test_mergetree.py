"""Semantic tests for the CH MergeTree-collapse analogs (a17/a18) on a
planted CDC stream exercising every collapse branch, plus the -Array /
ForEach combinator lanes vs numpy."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_to_clickhouse_spark.registry import all_queries


def _write_events(spark, tmp_path, rows):
    # (event_id, ts_us_offset, user_id, event_type, value)
    base = 1704067200_000_000  # 2024-01-01 UTC
    df = spark.createDataFrame(
        [
            (eid, (base + off) * 1000, uid, et, val, '{"k": 1}')
            for (eid, off, uid, et, val) in rows
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))


def test_a17_collapsing_branches(spark, tmp_path):
    day = 86_400_000_000
    rows = [
        # user 1: +1, +1 → net 2, latest +1 = event 3
        (1, 0, 1, "view", 10.0),
        (3, day, 1, "click", 30.0),
        # user 2: +1, -1 → net 0, vanishes
        (4, 0, 2, "view", 1.0),
        (5, day, 2, "error", 2.0),
        # user 3: -1, -1, +1 → net -1, earliest -1 = event 6
        (6, 0, 3, "error", 6.0),
        (7, day, 3, "error", 7.0),
        (8, 2 * day, 3, "view", 8.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = (
        all_queries()["a17_collapsing_merge"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .set_index("user_id")
    )
    assert set(out.index) == {1, 3}
    assert out.loc[1, "net"] == 2 and out.loc[1, "state_event_id"] == 3
    assert out.loc[1, "state_value"] == 30.0
    assert out.loc[3, "net"] == -1 and out.loc[3, "state_event_id"] == 6
    assert out.loc[3, "state_value"] == 6.0


def test_a18_versioned_collapse_day_scoped(spark, tmp_path):
    day = 86_400_000_000
    rows = [
        # user 1, day 0: +1 then cancel in SAME day → day 0 collapses;
        # day 1: surviving +1 → state from day 1
        (1, 0, 1, "view", 10.0),
        (2, 1_000_000, 1, "error", 11.0),
        (3, day, 1, "click", 12.0),
        # user 2: day 1 has net 0; day 0 survives → OLDER version wins
        (4, 0, 2, "view", 20.0),
        (5, day, 2, "view", 21.0),
        (6, day + 1_000_000, 2, "error", 22.0),
        # user 3: all days net ≤ 0 → absent
        (7, 0, 3, "error", 30.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = (
        all_queries()["a18_versioned_collapse"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .set_index("user_id")
    )
    assert set(out.index) == {1, 2}
    assert out.loc[1, "state_event_id"] == 3 and out.loc[1, "state_value"] == 12.0
    assert out.loc[2, "state_event_id"] == 4 and out.loc[2, "state_value"] == 20.0


def test_d21_lanes_match_numpy(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(3)
    X = rng.randn(40, 64).astype(np.float32)
    labels = [i % 3 for i in range(40)]
    spark.createDataFrame(
        [(i, [float(x) for x in X[i]], labels[i]) for i in range(40)],
        "vec_id long, embedding array<double>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = (
        all_queries()["d21_sum_foreach"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .set_index("label")
    )
    for lab in (0, 1, 2):
        want = np.floor(X[np.array(labels) == lab].astype(np.float64) * 1e4).sum(
            axis=0
        )
        got = np.array([int(s) for s in out.loc[lab, "sum_vec_fp"].split(",")])
        assert (got == want.astype(np.int64)).all()


def test_a17_random_streams_match_reference(spark, tmp_path):
    """Differential check on randomized CDC streams: a17's one-aggregate
    collapse must equal a row-at-a-time Python reference of the CH
    collapse rule (net>0 → latest +1; net<0 → earliest -1; net=0 →
    absent) for any interleaving of signs."""
    import random

    rng = random.Random(42)
    types = ["view", "click", "purchase", "signup", "error"]
    rows = []
    eid = 0
    for uid in range(25):
        for _ in range(rng.randint(0, 12)):
            et = types[rng.randrange(5)]
            rows.append((eid, eid * 1_000_000, uid, et, float(eid % 97)))
            eid += 1
    _write_events(spark, tmp_path, rows)

    # python reference
    want = {}
    per_user: dict[int, list] = {}
    for (e, _off, u, et, val) in rows:
        per_user.setdefault(u, []).append((e, -1 if et == "error" else 1, val))
    for u, evs in per_user.items():
        net = sum(s for (_e, s, _v) in evs)
        if net == 0:
            continue
        if net > 0:
            e, _s, v = max((x for x in evs if x[1] == 1), key=lambda x: x[0])
        else:
            e, _s, v = min((x for x in evs if x[1] == -1), key=lambda x: x[0])
        want[u] = (net, e, v)

    out = (
        all_queries()["a17_collapsing_merge"]
        .fn(spark, str(tmp_path))
        .toPandas()
        .set_index("user_id")
    )
    got = {
        int(u): (int(r["net"]), int(r["state_event_id"]), float(r["state_value"]))
        for u, r in out.iterrows()
    }
    assert got == want
