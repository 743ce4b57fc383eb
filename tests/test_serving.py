"""Publisher JSON-contract parity (gmall-publisher ChartController.java):
the serving functions must render the reference's exact JSON shapes with
values matching the DuckDB oracle counts."""

from __future__ import annotations

import json

from gmallrealtime02_spark import serving

_DATE = "2024-01-02"

_DAU_CTE = """
WITH dau AS (
    SELECT user_id AS mid,
           strftime(ts, '%Y-%m-%d') AS dt,
           strftime(ts, '%H') AS hr
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY strftime(ts, '%Y-%m-%d'), user_id
            ORDER BY ts, event_id
        ) AS rn
        FROM events
    )
    WHERE rn = 1
)
"""


def test_realtime_total_contract(spark, duck, sf_dir):
    out = json.loads(serving.realtime_total(spark, sf_dir, _DATE))
    want_total = duck.execute(
        _DAU_CTE + f"SELECT count(*) FROM dau WHERE dt = '{_DATE}'"
    ).fetchone()[0]
    assert out == [
        {"id": "dau", "name": "新增日活", "value": want_total},
        # ChartController.java:36-40 hardcodes the second tile's value
        {"id": "new_mid", "name": "新增设备", "value": 2},
    ]


def test_realtime_hour_contract(spark, duck, sf_dir):
    out = json.loads(serving.realtime_hour(spark, sf_dir, _DATE))
    assert set(out) == {"today", "yesterday"}
    want = {"today": {}, "yesterday": {}}
    for key, day_expr in (
        ("today", f"'{_DATE}'"),
        ("yesterday", f"strftime(DATE '{_DATE}' - INTERVAL 1 DAY, '%Y-%m-%d')"),
    ):
        rows = duck.execute(
            _DAU_CTE
            + f"SELECT hr, count(*) FROM dau WHERE dt = {day_expr} GROUP BY hr"
        ).fetchall()
        want[key] = {hr: ct for hr, ct in rows}
    assert out == want
    assert out["today"], "fixture day should have actives"
