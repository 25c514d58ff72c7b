"""Pool scaling samples across bench runs into one campaign artifact.

The scaling estimator (bench.py:_scaling_pass) is per-arm max over
temporally-spread, steal-bracketed samples: host interference can only
*slow* a run, so every sample is a lower bound on the arm's clean rate
and the best CLEAN-verified sample is the tightest bound available.
Under that physics, samples from several runs of the same staged
workload pool exactly like samples from one longer run — runs are just
groupings — so a measurement campaign (N runs across the day's
interference regimes) is summarized by recomputing the SAME stability
and plausibility rules over the union of samples. Nothing here reads
the efficiency value to decide anything; selection/stopping criteria
remain value-blind.

Usage:
    python scripts/pool_scaling.py run1.json run2.json ... > pooled.json

Each input is a bench.py output whose "scaling" section carries
samples_lo/hi, steal_lo/hi, cores_lo/hi, docs. Inputs must share the
same (cores_lo, cores_hi, docs) configuration.
"""

from __future__ import annotations

import json
import sys

STEAL_TAINT = 0.05


def _clean(samples):
    if all(s["steal"] is None for s in samples):
        return [s["rate"] for s in samples]
    return [
        s["rate"]
        for s in samples
        if s["steal"] is not None and s["steal"] <= STEAL_TAINT
    ]


def _stable(samples):
    clean = _clean(samples)
    if len(clean) < 2:
        return False
    top = sorted(clean, reverse=True)[:2]
    return top[1] >= 0.9 * top[0]


def _best(samples):
    clean = _clean(samples)
    if clean:
        return max(clean)
    return max((s["rate"] for s in samples), default=0.0)


def main(argv) -> int:
    runs = []
    for path in argv:
        with open(path) as f:
            doc = json.load(f)
        runs.append((path, doc["scaling"]))
    cfgs = {(s["cores_lo"], s["cores_hi"], s["docs"]) for _, s in runs}
    if len(cfgs) != 1:
        print(f"mixed configurations: {cfgs}", file=sys.stderr)
        return 2
    (cores_lo, cores_hi, docs), = cfgs
    factor = cores_hi / cores_lo

    lo, hi = [], []
    per_run = []
    for path, s in runs:
        for arm, out in (("lo", lo), ("hi", hi)):
            rates = s[f"samples_{arm}"]
            steals = s.get(f"steal_{arm}") or [None] * len(rates)
            for r, f_ in zip(rates, steals):
                out.append({"rate": r, "steal": f_, "run": path})
        per_run.append(
            {
                "run": path,
                "efficiency": s["efficiency"],
                "best_lo": s["docs_per_sec_lo"],
                "best_hi": s["docs_per_sec_hi"],
                "stable": bool(s["max_stable_lo"] and s["max_stable_hi"]),
                "plausible": s["plausible"],
            }
        )

    best_lo, best_hi = _best(lo), _best(hi)
    speedup = best_hi / best_lo if best_lo else 0.0
    pooled = {
        "campaign": "pooled per-arm-max over all steal-bracketed samples",
        "cores_lo": cores_lo,
        "cores_hi": cores_hi,
        "docs": docs,
        "runs": per_run,
        "n_samples_lo": len(lo),
        "n_samples_hi": len(hi),
        "clean_lo": len(_clean(lo)),
        "clean_hi": len(_clean(hi)),
        "steal_taint_threshold": STEAL_TAINT,
        "docs_per_sec_lo": round(best_lo, 2),
        "docs_per_sec_hi": round(best_hi, 2),
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / factor, 3),
        "max_stable_lo": _stable(lo),
        "max_stable_hi": _stable(hi),
        "plausible": bool(lo and hi and 1.0 <= speedup <= factor),
        "samples_lo": lo,
        "samples_hi": hi,
    }
    json.dump(pooled, sys.stdout, indent=1)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
