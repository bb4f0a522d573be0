

def test_lttb_matches_reference_per_series(spark):
    """d30: the distributed applyInPandas result equals the pure-Python
    LTTB reference run on each user's driver-collected series, and
    keeps endpoints + ts order."""
    import numpy as np

    from mysql_to_clickhouse_spark.operators.aggregates import (
        _LTTB_N_OUT,
        lttb_reference,
    )
    from mysql_to_clickhouse_spark.registry import all_queries
    from mysql_to_clickhouse_spark.tables import load
    from tests.conftest import SMOKE_SF_DIR

    import pyspark.sql.functions as F

    got = (
        all_queries()["d30_lttb_downsample"]
        .fn(spark, SMOKE_SF_DIR)
        .toPandas()
        .sort_values(["user_id", "point_rank"])
    )
    ev = (
        load(spark, SMOKE_SF_DIR, "events")
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "value", "event_id")
        .toPandas()
    )
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        keep = lttb_reference(
            g["ts_us"].to_numpy("int64"),
            g["value"].to_numpy("float64"),
            _LTTB_N_OUT,
        )
        exp = g.iloc[keep]
        act = got[got["user_id"] == uid]
        assert len(act) == len(exp) <= _LTTB_N_OUT
        assert act["ts_us"].tolist() == exp["ts_us"].tolist(), uid
        np.testing.assert_array_equal(
            act["value"].to_numpy(), exp["value"].to_numpy()
        )
        # endpoints always kept
        assert act["ts_us"].iloc[0] == g["ts_us"].iloc[0]
        assert act["ts_us"].iloc[-1] == g["ts_us"].iloc[-1]
