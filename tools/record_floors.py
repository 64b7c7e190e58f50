"""Merge bench.py artifacts into BASELINE_FLOORS.json — the
machine-readable same-protocol floors bench.py's trailing bench_summary
line compares against (worst_vs_floor).

Usage: python tools/record_floors.py run1.json [run2.json ...]

Each input is the WIDE line of a bench.py run (the first JSON line).
The merged floor per query is the MIN across runs; queries missing from
any run still floor on the runs that have them.  The output pins the
scale factor — bench.py only applies floors when its own sf matches.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    floors: dict[str, float] = {}
    sfs = set()
    sources = []
    for path in argv:
        with open(path) as f:
            # first JSON line that carries per-query timings
            doc = None
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                cand = json.loads(line)
                if "queries" in cand:
                    doc = cand
                    break
        if doc is None:
            print(f"no wide bench line in {path}", file=sys.stderr)
            return 2
        sfs.add(doc.get("sf"))
        sources.append(
            {
                "file": os.path.basename(path),
                "value": doc.get("value"),
                "contended": doc.get("contended"),
                "passes": doc.get("passes"),
            }
        )
        for name, sec in doc["queries"].items():
            if sec is None or sec < 0:
                continue
            prev = floors.get(name)
            if prev is None or sec < prev:
                floors[name] = sec
    if len(sfs) != 1:
        print(f"runs disagree on sf: {sfs}", file=sys.stderr)
        return 2
    out = {
        "sf": sfs.pop(),
        "total": round(sum(floors.values()), 3),
        "n_queries": len(floors),
        "sources": sources,
        "floors": dict(sorted(floors.items())),
    }
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_FLOORS.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {dest}: {out['n_queries']} floors, total {out['total']} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
