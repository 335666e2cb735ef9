#!/usr/bin/env python3
"""Endpoint latency/throughput benchmark (reference scripts/gcp/07 parity).

Fires concurrent requests at a deployed endpoint (or a local server URL),
reports p50/p95/p99, throughput, error rate, and cost-per-1M-requests.
"""

import argparse
import concurrent.futures
import json
import time
import urllib.request

import numpy as np


def one_request(url: str, payload: dict, timeout: float) -> tuple[float, bool]:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            r.read()
        return (time.perf_counter() - t0) * 1000, True
    except Exception:
        return (time.perf_counter() - t0) * 1000, False


def main() -> None:
    parser = argparse.ArgumentParser(description="Benchmark a recommendation endpoint")
    parser.add_argument("--url", type=str, default="http://127.0.0.1:8000/recommend")
    parser.add_argument("--num-requests", type=int, default=200)
    parser.add_argument("--concurrency", type=int, default=8)
    parser.add_argument("--num-items", type=int, default=10_000)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--timeout", type=float, default=10.0)
    parser.add_argument("--machine-cost-per-hour", type=float, default=0.19,
                        help="n1-standard-4 on-demand (reference cost model)")
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    payloads = [
        {"session_items": rng.integers(1, args.num_items, int(rng.integers(2, 10))).tolist(),
         "k": args.k}
        for _ in range(args.num_requests)
    ]

    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(max_workers=args.concurrency) as pool:
        results = list(pool.map(lambda p: one_request(args.url, p, args.timeout), payloads))
    wall = time.perf_counter() - t0

    lat = [ms for ms, ok in results if ok]
    errors = sum(1 for _, ok in results if not ok)
    if not lat:
        raise SystemExit(f"all {args.num_requests} requests failed")

    throughput = len(lat) / wall
    cost_per_1m = args.machine_cost_per_hour / 3600 / throughput * 1_000_000
    report = {
        "requests": args.num_requests,
        "concurrency": args.concurrency,
        "errors": errors,
        "p50_ms": float(np.percentile(lat, 50)),
        "p95_ms": float(np.percentile(lat, 95)),
        "p99_ms": float(np.percentile(lat, 99)),
        "throughput_rps": throughput,
        "cost_per_1m_requests_usd": cost_per_1m,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
