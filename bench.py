"""Benchmark entry point the driver runs on real TPU hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "suite"}:
the headline metric is the Schur-complement BA LM-iteration throughput
(continuity with BENCH_r01/r02), and the "suite" field carries EVERY
benchmark axis — SIFT images/s, matcher pairs/s (XLA + Pallas), BA dense
+ iterative-at-1000-cameras, and incremental-mapper images/s in both
registration modes — as measured THIS run. The same results are written
to BENCH_SUITE.json (flushed per-metric, so a mid-run device crash
keeps completed entries).

vs_baseline denominators are ESTIMATES (the reference repo publishes no
numbers — BASELINE.md); they are labeled as such in the JSON
(`baseline_estimate: true` per entry + a `baseline_note`).

The headline kernel: residuals + jacobians + scatter-free Schur block
assembly + reduced dense solve + point backsub on a 100-camera / 5k
point / ~37k observation synthetic scene — the regime of the reference's
per-cluster Ceres BA (DENSE_SCHUR tier,
/root/reference/src/optim/bundle_adjustment.cc:273-284). Assumed Ceres
throughput there: ~20 LM iters/s (estimate).
"""

import json


def main():
    from bench_suite import run_suite

    results = run_suite(echo=True)

    headline = None
    for r in results:
        if r["metric"].startswith("ba_lm_iters_per_s"):
            headline = r
            break
    if headline is None and results:
        headline = results[0]
    if headline is None:
        headline = {"metric": "suite_failed", "value": 0.0,
                    "unit": "n/a", "vs_baseline": 0.0}
    out = dict(headline)
    out["suite"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
