"""r14 weak-class re-adjudication under the FRESH-JVM protocol
(VERDICT r13 #4): all 12 adjudicated >2x rows — the headline seven and
the TPC-H five — re-measured at the largest scale with this round's
shipped forms (the broadcast cardinality gate behind Q5/Q8/Q11/Q17/Q19,
the Q16 dense class id, and the adopted layout variants), one process
per reading via tools/scale_probe_perproc.py.

The r13 warm multi-query protocol OOM'd the 8 GB JVM at sf100
(tools/weakclass_r13.py docstring); cold-in-a-fresh-JVM is the honest
number at that scale. Layout variants re-register their _SUCCESS-marked
warehouse files, so the write-once cost is NOT in these readings (that
is the layouts' whole claim). Results -> tools/weakclass_r14.json.

Usage: python tools/weakclass_r14.py [scale_dir] [timeout_s]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# (weak row, shipped form probed) — None = the plain form IS the
# shipped form
ROWS = [
    ("local_supplier_revenue", "local_supplier_revenue_layout"),
    ("shipping_priority", "shipping_priority_layout"),
    ("region_revenue", "region_revenue_layout"),
    ("rollup_revenue", "rollup_revenue_layout"),
    ("pricing_summary", None),
    ("cohort_retention", "cohort_retention_layout"),
    ("corpus_pipeline", None),
    ("tpch_q08", None),
    ("tpch_q11", None),
    ("tpch_q16", None),
    ("tpch_q17", None),
    ("tpch_q19", None),
]


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    timeout_s = sys.argv[2] if len(sys.argv) > 2 else "900"
    names = []
    for plain, layout in ROWS:
        names.append(plain)
        if layout:
            names.append(layout)
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "scale_probe_perproc.py"),
         scale_dir, timeout_s, *names],
    )
    probed = json.load(open(os.path.join(HERE, "scale_probe_perproc.json")))
    out = {
        "scale_dir": scale_dir,
        "protocol": "cold, fresh JVM per query (scale_probe_perproc)",
        "rows": {},
    }
    for plain, layout in ROWS:
        row = {"plain": probed["queries"].get(plain, {})}
        if layout:
            row["layout"] = probed["queries"].get(layout, {})
        best = min(
            (v.get("spark") for v in row.values()
             if isinstance(v, dict) and v.get("spark") is not None),
            default=None,
        )
        duck = row["plain"].get("duckdb")
        row["best_spark"] = best
        row["ratio_best"] = (
            round(best / duck, 2) if best and duck else None
        )
        out["rows"][plain] = row
    with open(os.path.join(HERE, "weakclass_r14.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["rows"], indent=1))
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
