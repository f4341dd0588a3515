"""Adaptive politeness (operators/adaptive_politeness.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jirlbot_spark.operators.adaptive_politeness import (
    adaptive_host_delays,
    with_adaptive_delay,
)
from jirlbot_spark.operators.politeness import politeness_schedule

LOG = [
    ("fast.com", 40),
    ("fast.com", 60),  # avg 50ms * 5 = 250 -> clamped up to 1000
    ("slow.com", 2000),
    ("slow.com", 4000),  # avg 3000 * 5 = 15000
    ("dead.com", 60000),  # 300000 -> clamped down to 30000
]


def test_delay_table_exact(spark):
    log = spark.createDataFrame(LOG, ["host", "rtt_ms"])
    out = {r["host"]: r.asDict() for r in adaptive_host_delays(log).collect()}
    assert out["fast.com"]["delay_ms"] == 1000  # min clamp
    assert out["slow.com"]["delay_ms"] == 15000
    assert out["dead.com"]["delay_ms"] == 30000  # max clamp
    assert out["slow.com"]["n_obs"] == 2
    assert out["slow.com"]["sum_rtt_ms"] == 6000


def test_integral_division_pinned(spark):
    # 3 obs summing 1001ms, factor 5 -> (5*1001) div 3 = 1668 (floor)
    log = spark.createDataFrame(
        [("h", 333), ("h", 334), ("h", 334)], ["host", "rtt_ms"]
    )
    out = adaptive_host_delays(log, min_delay_ms=0).collect()[0]
    assert out["delay_ms"] == (5 * 1001) // 3


def test_merge_robots_wins_when_larger(spark):
    log = spark.createDataFrame(LOG, ["host", "rtt_ms"])
    delays = adaptive_host_delays(log)
    admitted = spark.createDataFrame(
        [
            ("slow.com", 1, 20.0),  # robots 20s > adaptive 15s
            ("fast.com", 2, None),  # adaptive floor 1s
            ("new.com", 3, 2.5),  # no observations -> robots kept
        ],
        "host string, url_hash long, crawl_delay double",
    )
    out = {
        r["host"]: r["crawl_delay"]
        for r in with_adaptive_delay(admitted, delays).collect()
    }
    assert out["slow.com"] == 20.0
    assert out["fast.com"] == 1.0
    assert out["new.com"] == 2.5


def test_feeds_politeness_schedule(spark):
    log = spark.createDataFrame(LOG, ["host", "rtt_ms"])
    delays = adaptive_host_delays(log)
    admitted = spark.createDataFrame(
        [("slow.com", h, float(h), None) for h in range(3)],
        "host string, url_hash long, priority double, crawl_delay double",
    )
    sched = politeness_schedule(
        with_adaptive_delay(admitted, delays)
    ).orderBy("seq_in_host")
    times = [r["planned_at_s"] for r in sched.collect()]
    assert times == [0.0, 15.0, 30.0]  # spaced by the adaptive 15s


def test_partitioning_invariance(spark):
    log = spark.createDataFrame(LOG * 7, ["host", "rtt_ms"])
    a = sorted(map(tuple, adaptive_host_delays(log.repartition(9)).collect()))
    b = sorted(map(tuple, adaptive_host_delays(log.coalesce(1)).collect()))
    assert a == b
