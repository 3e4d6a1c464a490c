"""Fresh-JVM-per-query wrapper around tools/scale_probe.py --cold.

The r13 sf100 re-probe found the next stage of the r12 "aging" lesson:
even COLD readings taken back-to-back in one 8 GB JVM can OOM — the
first fact-fact query ages the heap enough that a later 530 MB bucketed
file read dies in the vectorized reader. One process per query is the
honest protocol at this scale; rows merge into
tools/scale_probe_perproc.json.

Usage: python tools/scale_probe_perproc.py [scale_dir] [timeout_s] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    timeout_s = sys.argv[2] if len(sys.argv) > 2 else "600"
    queries = sys.argv[3:]
    out = {"scale_dir": scale_dir, "protocol": "cold, fresh JVM per query",
           "queries": {}}
    result_path = os.path.join(HERE, "scale_probe_result.json")
    for q in queries:
        # a subprocess that dies BEFORE writing its result must not be
        # credited with a stale file left by a previous invocation of
        # the same query name (ADVICE r13) — remove it up front and
        # record proc_error when nothing fresh appears
        if os.path.exists(result_path):
            os.remove(result_path)
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "scale_probe.py"),
             scale_dir, timeout_s, "--cold", q],
            capture_output=True, text=True,
        )
        row = {}
        try:
            with open(result_path) as f:
                row = json.load(f)["queries"].get(q, {})
        except Exception as e:  # noqa: BLE001
            row = {"wrapper_error": f"{type(e).__name__}: {e}"[:200]}
        if r.returncode != 0 and "spark" not in row:
            row.setdefault(
                "proc_error", (r.stderr or r.stdout).strip()[-300:]
            )
        out["queries"][q] = row
        print(q, row, flush=True)
        with open(os.path.join(HERE, "scale_probe_perproc.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
