"""Summarize the r13 sf1 8-vs-32-core sweep into SCALING_r13.json.

Inputs: two BENCH_DETAIL snapshots produced by running bench.py against
the gen_scale_data.py sf1 directory at SPARK_GRAFT_CPUS=32 and =8.
Output: per-query ratios (t8/t32) and a ranked serial-suspect list —
queries that are slow at sf1 AND show no parallel speedup (ratio ~1)
are the real serialization suspects; at sf0.1 the whole bench was
fixed-overhead bound and this distinction was invisible (VERDICT r12
item 7).

    python scripts/scale_sweep_r13.py c32_detail.json c8_detail.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    c32 = json.load(open(sys.argv[1]))["timings"]
    c8 = json.load(open(sys.argv[2]))["timings"]
    common = sorted(set(c32) & set(c8))
    rows = []
    for name in common:
        t32, t8 = c32[name], c8[name]
        rows.append(
            {
                "query": name,
                "t32": t32,
                "t8": t8,
                "ratio_8v32": round(t8 / t32, 2) if t32 else None,
            }
        )
    # serial suspects: meaningful wall time at sf1 on 32 cores AND no
    # parallel benefit (4x fewer cores costs <25% more time)
    suspects = sorted(
        (r for r in rows if r["t32"] >= 1.0 and r["ratio_8v32"] is not None
         and r["ratio_8v32"] < 1.25),
        key=lambda r: -r["t32"],
    )
    out = {
        "sf": 1,
        "cpus_main": 32,
        "cpus_low": 8,
        "total_t32": round(sum(c32.values()), 1),
        "total_t8": round(sum(c8.values()), 1),
        "per_query": rows,
        "serial_suspects_ranked": [
            {k: r[k] for k in ("query", "t32", "t8", "ratio_8v32")}
            for r in suspects
        ],
    }
    path = os.path.join(REPO, "SCALING_r13.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}: {len(rows)} queries, "
          f"{len(suspects)} serial suspects")
    for r in suspects[:15]:
        print(f"  {r['t32']:6.2f}s x{r['ratio_8v32']:.2f}  {r['query']}")


if __name__ == "__main__":
    main()
