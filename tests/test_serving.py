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


def test_paged_detail_contract(spark, duck, sf_dir):
    out = json.loads(serving.paged_detail(spark, sf_dir, page=2, size=5, draw=7))
    assert out["draw"] == 7
    want_total = duck.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert out["total"] == want_total
    want_rows = duck.execute("""
        SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_orderstatus,
               o_totalprice, o_orderdate
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderdate DESC, o_orderkey ASC
        LIMIT 5 OFFSET 5
    """).fetchall()
    assert [r["order_id"] for r in out["rows"]] == [w[0] for w in want_rows]
    assert [r["user_name"] for r in out["rows"]] == [w[2] for w in want_rows]


def test_paged_detail_keyword_filter(spark, duck, sf_dir):
    kw = "0000001"
    out = json.loads(serving.paged_detail(spark, sf_dir, size=10, keyword=kw))
    want_total = duck.execute(
        "SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey "
        f"WHERE c_name LIKE '%{kw}%'"
    ).fetchone()[0]
    assert out["total"] == want_total
    assert all(kw in r["user_name"] for r in out["rows"])


def test_stat_groups_contract(spark, duck, sf_dir):
    out = json.loads(serving.stat_groups(spark, sf_dir))
    want_tiers = dict(duck.execute("""
        SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'vip'
                    WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END AS tier, count(*)
        FROM customer GROUP BY 1
    """).fetchall())
    want_segs = dict(duck.execute("""
        SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'B' ELSE 'C' END, count(*)
        FROM customer GROUP BY 1
    """).fetchall())
    got_tiers = {g["name"]: g["value"] for g in out["stat"][0]["group"]}
    got_segs = {g["name"]: g["value"] for g in out["stat"][1]["group"]}
    assert got_tiers == want_tiers
    assert got_segs == want_segs


def test_paged_detail_multi_token_keyword_is_es_or(spark, duck, sf_dir):
    """ES match-query parity: a two-token keyword ORs the terms (the
    reference forwards keyword to an ES match, whose standard analyzer
    ORs analyzed terms) — not a single substring match."""
    kw = "0000001 0000002"
    out = json.loads(serving.paged_detail(spark, sf_dir, size=10, keyword=kw))
    want_total = duck.execute(
        "SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE c_name LIKE '%0000001%' OR c_name LIKE '%0000002%'"
    ).fetchone()[0]
    assert out["total"] == want_total
    assert want_total > 0
    assert all(
        "0000001" in r["user_name"] or "0000002" in r["user_name"]
        for r in out["rows"]
    )


def test_map_order_data_contract(spark, duck, sf_dir):
    """getChinaOrderData parity (IndexController.java:198-202 — the
    reference stubs this; the echarts map series shape is the contract):
    sorted [{name, value}] of order revenue per customer nation."""
    out = json.loads(serving.map_order_data(spark, sf_dir))
    want = duck.execute("""
        SELECT n_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """).fetchall()
    assert out == [{"name": n, "value": v} for n, v in want]
    assert len(out) == 25


def test_deep_page_keyset_matches_offset(spark, duck, sf_dir, monkeypatch):
    """Past DEEP_PAGE_ROWS the fetch switches to keyset seek; the rows
    must be IDENTICAL to the offset path's (same sort, same slice) —
    checked by forcing the threshold down so the same page runs both
    strategies."""
    page, size = 7, 9  # skip=54 rows
    offset = json.loads(serving.paged_detail(spark, sf_dir, page=page, size=size))
    monkeypatch.setattr(serving, "DEEP_PAGE_ROWS", 10)
    keyset = json.loads(serving.paged_detail(spark, sf_dir, page=page, size=size))
    assert keyset["rows"] == offset["rows"]
    assert keyset["total"] == offset["total"]
    assert keyset["last_key"] == [
        offset["rows"][-1]["order_date"],
        offset["rows"][-1]["order_id"],
    ]


def test_cursor_walk_reconstructs_offset_pages(spark, duck, sf_dir):
    """Walking with after= (each response's last_key) reproduces the
    offset pagination page-for-page — the O(size) dashboard path."""
    size = 11
    flat = []
    for page in (1, 2, 3):
        flat += json.loads(
            serving.paged_detail(spark, sf_dir, page=page, size=size)
        )["rows"]
    walked, after = [], None
    for _ in range(3):
        out = json.loads(
            serving.paged_detail(spark, sf_dir, size=size, after=after)
        )
        walked += out["rows"]
        after = out["last_key"]
    assert walked == flat


def test_deep_page_beyond_data_is_empty(spark, duck, sf_dir, monkeypatch):
    monkeypatch.setattr(serving, "DEEP_PAGE_ROWS", 10)
    out = json.loads(serving.paged_detail(spark, sf_dir, page=10**6, size=20))
    assert out["rows"] == [] and out["last_key"] is None


def test_keyset_boundary_plan_driver_pull_is_one_row(spark, duck, sf_dir):
    """The boundary finder must deliver exactly one row (the whole point:
    deep pages stop pulling page*size rows to the driver) and its plan
    must stay a TakeOrdered composition — no global sort exchange."""
    from gmallrealtime02_spark.sources import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").alias("order_date"),
    )
    b = serving.keyset_boundary_plan(o, 500)
    rows = b.collect()
    assert len(rows) == 1
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
