#!/usr/bin/env python
"""Map external load onto bench stamps and compute a salvage composite.

Usage: python scripts/stamp_salvage.py REF.json SUSPECT.json [BUCKET_S]

The box carries intermittent external load (documented swings of
loadavg 0.16 -> 102 within one r15 session), and the pre/post host
gauges alone cannot say WHICH lanes a mid-run spike hit.  From r15
every detail stamp carries ``query_phase_started_unix`` plus a
per-lane ``at_s`` start offset, so a contaminated stamp can be
partially salvaged instead of discarded:

1. per-time-bucket median of SUSPECT/REF lane ratios — a flat ~1.0
   profile with one elevated band localizes the spike's window (the
   r15 maiden run showed 1.0x for 280s, then a sustained 1.3-1.46x
   tail; the early stamp was contaminated in a DIFFERENT band);
2. the per-lane min composite across both stamps — with disjoint
   contamination windows this approximates a clean run (r15: 89.4s
   composite vs the 89.8s clean re-stamp that followed, within 0.4s).

REF is the comparison baseline (an earlier clean stamp, or the other
partially-contaminated stamp); SUSPECT is the stamp being diagnosed.
Lanes missing from either stamp are skipped.  Pure stdlib, no Spark.
"""

from __future__ import annotations

import json
import statistics
import sys


def salvage(ref_path: str, sus_path: str, bucket_s: int = 60) -> dict:
    ref_stamp = json.load(open(ref_path))
    sus_stamp = json.load(open(sus_path))
    ref, sus = ref_stamp["queries"], sus_stamp["queries"]
    common = [n for n in sus if n in ref]
    buckets: dict[int, list[float]] = {}
    for n in common:
        at = sus[n].get("at_s")
        if at is None:  # pre-r15 stamp without offsets
            continue
        buckets.setdefault(int(at // bucket_s) * bucket_s, []).append(
            sus[n]["median_s"] / ref[n]["median_s"]
        )
    profile = {
        k: round(statistics.median(v), 2) for k, v in sorted(buckets.items())
    }
    composite = sum(
        min(ref[n]["median_s"], sus[n]["median_s"]) for n in common
    )
    hot = [
        (round(sus[n]["median_s"] / ref[n]["median_s"], 2), n)
        for n in common
        if sus[n]["median_s"] / ref[n]["median_s"] > 1.3
    ]
    return {
        "n_lanes": len(common),
        "ref_total_s": round(sum(ref[n]["median_s"] for n in common), 1),
        "suspect_total_s": round(sum(sus[n]["median_s"] for n in common), 1),
        "min_composite_s": round(composite, 1),
        "per_bucket_ratio": profile,
        "gauges": {
            "ref": [
                ref_stamp.get("host_speed_mt_s"),
                ref_stamp.get("host_speed_post_s"),
                ref_stamp.get("loadavg_end"),
            ],
            "suspect": [
                sus_stamp.get("host_speed_mt_s"),
                sus_stamp.get("host_speed_post_s"),
                sus_stamp.get("loadavg_end"),
            ],
        },
        "lanes_over_1p3x": sorted(hot, reverse=True)[:15],
    }


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    print(json.dumps(salvage(sys.argv[1], sys.argv[2], b), indent=1))
