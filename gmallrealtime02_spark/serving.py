"""Publisher-parity serving layer: the reference's REST JSON contracts.

The reference serves DAU answers through two Spring endpoints backed by
Elasticsearch (gmall-publisher ChartController.java:23-61 →
DauServicelmpl.java:27-74) and mirrors them in the dw-chart app
(IndexController.java:58-110).  Here the same contracts are thin
driver-side renderers over the registered DAU queries — the heavy work
(parse → dt/hr derive → first-seen dedup → agg) is the distributed
plan in operators/dau.py; what reaches the driver is one row per day
or 24 rows per day, so the ``collect()`` is the serving layer's job,
not an operator smell.

Scale note: both endpoints bound the events scan to the requested
day(s) via ``ts_bounds``, which pushes a raw-long parquet filter below
the nanos→µs conversion (sources/tables.py) — on a date-sorted 100 TB
fact that is row-group pruning, i.e. the endpoint reads ~1 day of
data, not the table.
"""

from __future__ import annotations

import json
from datetime import date as _date
from datetime import timedelta

from pyspark.sql import SparkSession

from .operators import dau as dau_ops
from .sources import load_table

# The reference hardcodes the second tile (ChartController.java:36-40:
# `newMap.put("value", 2)`), ids and zh-CN display names included.
_NEW_MID_VALUE = 2


def _day_bounds(date: str) -> tuple[str, str]:
    return (f"{date} 00:00:00", f"{date} 23:59:59.999999")


def _dau_for_dates(spark: SparkSession, sf_dir: str, dates: list[str]):
    lo = min(dates)
    hi = max(dates)
    events = load_table(
        spark,
        sf_dir,
        "events",
        ts_bounds={"ts": (_day_bounds(lo)[0], _day_bounds(hi)[1])},
    )
    return dau_ops.dau_rows(events)


def realtime_total(spark: SparkSession, sf_dir: str, date: str) -> str:
    """GET /realtime-total?date=… — JSON list of stat tiles
    (ChartController.java:23-46): the day's DAU plus the reference's
    hardcoded new-device tile, ids/names/values bit-identical."""
    dau = _dau_for_dates(spark, sf_dir, [date])
    rows = dau_ops.dau_total(dau).filter(f"dt = '{date}'").collect()
    total = rows[0]["total"] if rows else 0
    return json.dumps(
        [
            {"id": "dau", "name": "新增日活", "value": total},
            {"id": "new_mid", "name": "新增设备", "value": _NEW_MID_VALUE},
        ],
        ensure_ascii=False,
    )


def realtime_hour(spark: SparkSession, sf_dir: str, date: str) -> str:
    """GET /realtime-hour?id=dau&date=… — {"today": {hr: ct}, "yesterday":
    {hr: ct}} (ChartController.java:48-61).  The reference runs two ES
    terms-aggs and stitches; here it is ONE scan of the two bounded days
    (operators/dau.py dau_today_yesterday) split driver-side.  Hours with
    no actives are absent, matching the ES terms-agg behavior."""
    yesterday = (_date.fromisoformat(date) - timedelta(days=1)).isoformat()
    dau = _dau_for_dates(spark, sf_dir, [yesterday, date])
    rows = dau_ops.dau_today_yesterday(dau, date).collect()
    out: dict[str, dict[str, int]] = {"today": {}, "yesterday": {}}
    for r in rows:
        if r["dt"] == date:
            out["today"][r["hr"]] = r["ct"]
        elif r["dt"] == yesterday:
            out["yesterday"][r["hr"]] = r["ct"]
    return json.dumps(out)
