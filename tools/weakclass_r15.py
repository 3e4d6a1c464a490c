"""r15 weak-class re-adjudication at sf100 (VERDICT r14 #3/#4/#6/#7).

Measures the rows this round changed — the gate+layout compositions
(Q3/Q5), the new partkey family (Q16), the window rewrites (q17/q20),
the derived epoch-week cohort layout — plus the carried mid-band rows
(q8/q9/corpus_pipeline/pricing) so tools/tpch_sweep_sf100.json can be
refreshed to ADOPTED-form numbers in one consistent table.

Protocol: warm (cold + min-of-2 warm) via tools/scale_probe.py, ONE
QUERY PER PROCESS (the r14 lesson: even cold readings back-to-back in
one 8 GB JVM age the heap). Results -> tools/weakclass_r15.json.

Usage: python tools/weakclass_r15.py [scale_dir] [timeout_s]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# (weak row, adopted/layout form probed) — None = plain form IS adopted
ROWS = [
    ("shipping_priority", "shipping_priority_layout"),
    ("local_supplier_revenue", "local_supplier_revenue_layout"),
    ("cohort_retention", "cohort_retention_layout"),
    ("tpch_q16", "supplier_part_counts_layout"),
    ("tpch_q17", None),
    ("tpch_q20", None),
    ("tpch_q08", None),
    ("tpch_q09", None),
    ("corpus_pipeline", None),
    ("pricing_summary", "pricing_summary_layout"),
]


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    timeout_s = sys.argv[2] if len(sys.argv) > 2 else "900"
    result_path = os.path.join(HERE, "scale_probe_result.json")
    out = {
        "scale_dir": scale_dir,
        "protocol": "cold + min-of-2 warm, fresh JVM per query "
                    "(scale_probe, one query per process)",
        "rows": {},
    }
    for plain, layout in ROWS:
        row = {}
        for label, name in (("plain", plain), ("layout", layout)):
            if name is None:
                continue
            if os.path.exists(result_path):
                os.remove(result_path)
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "scale_probe.py"),
                 scale_dir, timeout_s, name],
                capture_output=True, text=True,
                timeout=float(timeout_s) + 600,
            )
            try:
                with open(result_path) as f:
                    row[label] = json.load(f)["queries"].get(name, {})
            except Exception as e:  # noqa: BLE001
                row[label] = {
                    "wrapper_error": f"{type(e).__name__}: {e}"[:200]
                }
            if r.returncode != 0 and "spark" not in row[label]:
                row[label].setdefault(
                    "proc_error", (r.stderr or r.stdout).strip()[-300:]
                )
        best = min(
            (v.get("spark") for v in row.values()
             if isinstance(v, dict) and v.get("spark") is not None),
            default=None,
        )
        duck = min(
            (v.get("duckdb") for v in row.values()
             if isinstance(v, dict) and v.get("duckdb") is not None),
            default=None,
        )
        row["best_spark"] = best
        row["ratio_best"] = round(best / duck, 2) if best and duck else None
        out["rows"][plain] = row
        print(plain, json.dumps(row), flush=True)
        with open(os.path.join(HERE, "weakclass_r15.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
