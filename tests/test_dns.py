"""DNS cache operator (operators/dns.py): delta resolution, TTL expiry,
negative caching, supersede merge, and per-server politeness keying."""

from __future__ import annotations

from pyspark.sql import functions as F

from jirlbot_spark.operators.dns import (
    arith_resolver,
    attach_server_key,
    dns_needed,
    refresh_dns_cache,
    socket_resolver,
)


def _hosts(spark, ids):
    return spark.createDataFrame(
        [(int(i),) for i in ids], "host_hash long"
    )


def _cache(spark, rows):
    return spark.createDataFrame(
        rows, "host_hash long, ip string, resolved_batch int, ttl_batches int"
    )


def test_dns_needed_no_cache_is_all_distinct(spark):
    got = {
        r.host_hash
        for r in dns_needed(_hosts(spark, [1, 2, 2, 3]), None, 5).collect()
    }
    assert got == {1, 2, 3}


def test_dns_needed_miss_expiry_and_negative_cache(spark):
    cache = _cache(
        spark,
        [
            (1, "10.0.0.1", 0, 4),  # expires at batch 4 -> expired at 5
            (2, "10.0.0.2", 3, 4),  # expires at 7 -> fresh at 5
            (3, None, 4, 4),  # NXDOMAIN, fresh: negative cache HOLDS
        ],
    )
    got = {
        r.host_hash
        for r in dns_needed(_hosts(spark, [1, 2, 3, 9]), cache, 5).collect()
    }
    assert got == {1, 9}  # expired + miss; fresh positive AND negative stay


def test_refresh_supersedes_by_host(spark):
    cache = _cache(spark, [(1, "10.0.0.1", 0, 4), (2, "10.0.0.2", 3, 4)])
    resolved = spark.createDataFrame(
        [(1, "10.9.9.9"), (7, None)], "host_hash long, ip string"
    )
    out = {
        r.host_hash: (r.ip, r.resolved_batch, r.ttl_batches)
        for r in refresh_dns_cache(cache, resolved, 5, ttl_batches=8).collect()
    }
    assert out == {
        1: ("10.9.9.9", 5, 8),  # superseded, TTL restarted
        2: ("10.0.0.2", 3, 4),  # untouched
        7: (None, 5, 8),  # NXDOMAIN cached
    }


def test_arith_resolver_matches_python_reference(spark):
    ids = list(range(0, 400, 7)) + [2**40 + 3, -(2**40) - 3]
    got = {
        r.host_hash: r.ip
        for r in arith_resolver(_hosts(spark, ids)).collect()
    }
    for i in ids:
        mix = ((i % 2147483648) * 2654435761) % 4294967296
        want = None if mix % 17 == 0 else f"10.0.0.{mix % 64}"
        assert got[i] == want, i


def test_attach_server_key_groups_virtual_hosts_and_falls_back(spark):
    cache = _cache(
        spark,
        [
            (1, "10.0.0.9", 0, 64),
            (2, "10.0.0.9", 0, 64),  # same server as host 1
            (3, None, 0, 64),  # NXDOMAIN
        ],
    )
    urls = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300), (4, 400)],
        "host_hash long, url_id long",
    )
    rows = {r.url_id: r for r in attach_server_key(urls, cache).collect()}
    assert rows[100].serve_key == rows[200].serve_key  # shared box, one queue
    assert rows[300].serve_key == 3  # NXDOMAIN -> host_hash fallback
    assert rows[400].serve_key == 4  # uncached -> host_hash fallback
    assert rows[100].serve_key != rows[300].serve_key


def test_socket_resolver_injected_lookup(spark):
    table = {"a.example": "1.2.3.4"}
    resolve = socket_resolver(getaddr=lambda h: table.get(h))
    needed = spark.createDataFrame(
        [(11, "a.example"), (12, "gone.example")],
        "host_hash long, host string",
    )
    got = {r.host_hash: r.ip for r in resolve(needed).collect()}
    assert got == {11: "1.2.3.4", 12: None}


def test_full_batch_cycle_politeness_by_server(spark):
    """Two batches end-to-end: resolve delta only, then schedule by
    serve_key — hosts sharing an IP serialize into ONE queue."""
    from jirlbot_spark.operators.politeness import politeness_schedule

    hosts_b0 = _hosts(spark, range(75))
    need0 = dns_needed(hosts_b0, None, 0)
    cache0 = refresh_dns_cache(None, arith_resolver(need0), 0, ttl_batches=4)
    assert cache0.count() == 75

    # batch 1: same hosts + 5 new; only the new ones hit the resolver
    hosts_b1 = _hosts(spark, range(80))
    need1 = dns_needed(hosts_b1, cache0, 1)
    assert {r.host_hash for r in need1.collect()} == {75, 76, 77, 78, 79}
    cache1 = refresh_dns_cache(cache0, arith_resolver(need1), 1)
    assert cache1.count() == 80

    urls = spark.range(240).select(
        F.pmod(F.col("id"), F.lit(80)).alias("host_hash"),
        F.col("id").alias("url_hash"),
        (F.col("id") % 3).cast("double").alias("priority"),
    )
    keyed = attach_server_key(urls, cache1)
    sched = politeness_schedule(
        keyed, host_col="serve_key", min_delay_s=2.0
    ).collect()
    by_key: dict[int, list[float]] = {}
    for r in sched:
        by_key.setdefault(r.serve_key, []).append(r.planned_at_s)
    # spacing >= delay inside every server queue
    for times in by_key.values():
        times.sort()
        assert all(b - a >= 2.0 for a, b in zip(times, times[1:]))
    # virtual hosting actually occurred: fewer queues than hosts
    n_resolved_hosts = cache1.where(F.col("ip").isNotNull()).count()
    n_queues_for_resolved = len(
        {r.serve_key for r in sched if r.ip is not None}
    )
    assert n_queues_for_resolved < n_resolved_hosts


def test_loop_dns_resolver_integration(spark, tmp_path):
    """CrawlLoop with an injected dns_resolver: batch 1 resolves every
    host once (delta = all), batch 2 resolves ONLY the newly discovered
    host; two hosts sharing an IP serialize into one politeness queue;
    the NXDOMAIN host still fetches (host_hash-keyed fallback queue)."""
    from jirlbot_spark.operators.dns import socket_resolver
    from jirlbot_spark.plans.loop import CrawlConfig, CrawlLoop
    from jirlbot_spark.sources.storage import TableStore

    ips = {"a.example": "9.9.9.9", "b.example": "9.9.9.9"}  # c. -> NX

    link_table = spark.createDataFrame(
        [
            ("http://a.example/0", "http://a.example/new"),
            ("http://a.example/0", "http://d.example/fresh"),
        ],
        ["src_url", "dst_url"],
    )
    store = TableStore(spark, str(tmp_path / "dnsloop"))
    loop = CrawlLoop(
        spark,
        store,
        None,
        link_table,
        None,
        CrawlConfig(salt_buckets=4, image_scale=10, min_delay_s=2.0),
        dns_resolver=socket_resolver(getaddr=lambda h: ips.get(h)),
    )
    seeds = spark.createDataFrame(
        [
            ("http://a.example/0",),
            ("http://a.example/1",),
            ("http://b.example/0",),
            ("http://c.example/0",),
        ],
        ["url"],
    )
    loop.ingest_seeds(seeds)
    # robots-UNKNOWN defers each new host one batch, so seeds fetch in
    # batch 2 and the batch-2-discovered d.example fetches in batch 4
    loop.run(4)

    cache = store.read("dns_cache").collect()
    fetch_log = store.read("fetch_log").collect()
    # loop host_hash is the murmur3 kernel's — map via the robots table,
    # which carries (host_hash, host) for every host ever seen
    hash_to_host = {
        r.host_hash: r.host
        for r in store.read("robots").select("host_hash", "host").collect()
    }
    by_host: dict[str, list] = {}
    for row in cache:
        by_host.setdefault(hash_to_host[row.host_hash], []).append(row)
    # every host resolved exactly once EVER (delta-only; TTL never hit)
    assert {len(v) for v in by_host.values()} == {1}
    batch_of = {h: v[0].resolved_batch for h, v in by_host.items()}
    assert batch_of["a.example"] == 2
    assert batch_of["b.example"] == 2
    assert batch_of["c.example"] == 2
    assert batch_of["d.example"] == 4  # discovered via batch-2 link
    ip_of = {h: v[0].ip for h, v in by_host.items()}
    assert ip_of["a.example"] == "9.9.9.9" and ip_of["b.example"] == "9.9.9.9"
    assert ip_of["c.example"] is None

    # NXDOMAIN host still fetched (fallback queue, not dropped)
    assert "http://c.example/0" in {r.url for r in fetch_log}

    # shared-server politeness: a.example + b.example rows in batch 2
    # share ONE queue -> combined spacing >= min_delay_s
    b2 = [
        r.planned_at_s
        for r in fetch_log
        if r.batch == 2 and r.host in ("a.example", "b.example")
    ]
    b2.sort()
    assert len(b2) == 3
    assert all(t2 - t1 >= 2.0 for t1, t2 in zip(b2, b2[1:]))
