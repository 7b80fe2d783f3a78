#!/usr/bin/env python
"""Big-round amortization evidence (BENCH/BASELINE.md "control-plane
cost amortizes" claim): run the full frontier at round sizes spanning
4x — the biggest round carries >=10^5 URLs — and show per-round wall
time scales with the round's data volume (granted fetches), not with
round count.

Method: same engine config at n_domains in SCALE_BIGROUND_DOMAINS
(default "100000,1000000" — the biggest round carries >=10^6 URLs);
every round's (granted, seconds) is recorded from the crawler's round
trace.  If per-round time were dominated by fixed control-plane cost
(snapshot commits, bloom rebroadcast, driver scalars), sec/granted
would fall ~4x from the small to the large size; if the data plane
dominates, sec/granted stays ~flat.  The VM's ~3x noise caveat applies
(see BENCH/BASELINE.md); single run, warm rounds only (round 0 pays
one-time codegen + python-worker spin-up and is reported separately).

Fetch path: gen_web_fn — pages regenerate procedurally inside the
fetch workers (pure per-domain RNG, byte-identical to gen_web,
parity-tested).  A 10^6-domain web as a broadcast dict would pickle
multi-GB into every Python worker; the closure ships as KBs, which is
also why both sizes use it (same fetch mechanism = comparable us/URL).

Usage: python tools/bench_biground.py     # writes one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = [
    int(x)
    for x in os.environ.get("SCALE_BIGROUND_DOMAINS", "100000,1000000").split(",")
]
CPUS = int(os.environ.get("SCALE_CPUS_BIG", "32"))


def run_size(n_domains: int) -> dict:
    from pyspark.sql import SparkSession

    from privacy_crawler_parser_tokenizer_spark.plans.frontier import (
        FrontierConfig,
        FrontierCrawler,
        PythonFetcher,
    )
    from privacy_crawler_parser_tokenizer_spark.sources.synth import (
        gen_web_fn,
        make_dictionary,
        make_ground_truth,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"pcpt-biground-{n_domains}")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    fetch_fn, seeds, robots = gen_web_fn(n_domains, seed=42)
    gen_sec = time.monotonic() - t0
    # Bloom sized to the web (~4 URLs/domain), never below the old cap
    bloom_cap = max(1 << 22, 1 << (n_domains * 8 - 1).bit_length())
    fc = FrontierCrawler(
        spark,
        tempfile.mkdtemp(prefix=f"pcpt-biground-{n_domains}-"),
        fetcher=PythonFetcher(fetch_fn),
        seeds=seeds,
        ground_truth=make_ground_truth(),
        dictionary=make_dictionary(),
        robots=robots,
        config=FrontierConfig(threshold=0.3, max_depth=2, host_budget=None,
                              bloom_capacity=bloom_cap),
    )
    t1 = time.monotonic()
    fc.run()
    crawl_sec = time.monotonic() - t1
    rounds = [
        {"round": tr["round"], "granted": tr["granted"],
         "sec": round(fc.round_seconds[i], 2)}
        for i, tr in enumerate(fc.round_trace)
    ]
    # warm rounds with meaningful volume: exclude round 0 (one-time
    # codegen/worker spin-up) and tail rounds under 10% of the seed count
    warm = [r for r in rounds[1:] if r["granted"] >= n_domains * 0.1]
    warm_sec = sum(r["sec"] for r in warm)
    warm_granted = sum(r["granted"] for r in warm)
    spark.stop()
    return {
        "n_domains": n_domains,
        "gen_sec": round(gen_sec, 1),
        "crawl_sec": round(crawl_sec, 1),
        "rounds": rounds,
        "warm_rounds": len(warm),
        "warm_granted": warm_granted,
        "warm_sec": round(warm_sec, 2),
        "warm_us_per_url": round(warm_sec / warm_granted * 1e6, 1)
        if warm_granted
        else None,
        "max_round_urls": max((r["granted"] for r in rounds), default=0),
    }


def main() -> None:
    out = {"cpus": CPUS, "sizes": [run_size(n) for n in SIZES]}
    small, big = out["sizes"][0], out["sizes"][-1]
    if small["warm_us_per_url"] and big["warm_us_per_url"]:
        # <1: bigger rounds are CHEAPER per URL (fixed cost amortizes)
        out["big_vs_small_us_per_url_ratio"] = round(
            big["warm_us_per_url"] / small["warm_us_per_url"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
