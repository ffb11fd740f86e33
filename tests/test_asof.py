"""As-of join edge semantics on handcrafted data: inclusive at equal
timestamps, NULL when no signup precedes, latest-of-several wins."""

from __future__ import annotations

from cocktails_data_engineering_spark.operators.extensions import asof_join_last_signup


def test_asof_edge_semantics(spark, tmp_path):
    import pandas as pd

    rows = [
        # user 1: signup exactly AT the purchase time → inclusive match
        (101, "2024-01-01 10:00:00.000000", 1, "signup", 0.0, "{}"),
        (102, "2024-01-01 10:00:00.000000", 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE any signup → NULL
        (201, "2024-01-01 09:00:00.000000", 2, "purchase", 1.0, "{}"),
        (202, "2024-01-01 11:00:00.000000", 2, "signup", 0.0, "{}"),
        # user 3: two signups before the purchase → the later one wins
        (301, "2024-01-01 08:00:00.000000", 3, "signup", 0.0, "{}"),
        (302, "2024-01-01 09:30:00.000000", 3, "signup", 0.0, "{}"),
        (303, "2024-01-01 10:00:00.000000", 3, "purchase", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
    out = str(tmp_path / "events.parquet")
    pdf.to_parquet(out)

    result = {
        r.event_id: r.last_signup_us
        for r in asof_join_last_signup(spark, str(tmp_path)).collect()
    }

    def us(s):
        return int(pd.Timestamp(s).value // 1000)

    assert result[102] == us("2024-01-01 10:00:00")  # inclusive tie
    assert result[201] is None                        # nothing precedes
    assert result[303] == us("2024-01-01 09:30:00")   # latest prior signup
