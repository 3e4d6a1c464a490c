"""Tile the sf0.1 testdata into a larger benchmark-only dataset.

Usage: python tools/make_scale.py [factor] [src_dir] [dst_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/sf1)

Replicates each table ``factor`` times with per-replica key offsets so the
result behaves like a genuinely bigger dataset, not a degenerate pile of
duplicates:

- fact/dim keys (`o_orderkey`, `c_custkey`, `event_id`, `user_id`,
  `doc_id`, `vec_id`, ...) get ``replica * 100_000_000`` added, so join
  fan-outs, group cardinalities, and session/user counts all scale with
  the factor (nation/region stay fixed — dimension tables don't grow with
  data volume in a real warehouse);
- `documents.text` gets every token suffixed with ``_<replica>`` (replica
  0 untouched): replicas share ZERO shingles, so the near-dup pair space
  scales exactly linearly — appending/perturbing text instead would make
  every replica a near-duplicate of every other and blow the pair space
  up quadratically, which benchmarks the wrong thing;
- `embeddings` keep their vectors (cost per candidate is what the ANN
  bench measures); replica 0 keeps vec_id < 10 so the query set is
  unchanged while the candidate pool scales.

BENCH-ONLY data: correctness runs exclusively on the driver's testdata.
pyarrow is used end-to-end so parquet physical types (notably events.ts
TIMESTAMP(NANOS)) survive byte-exact.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 100_000_000

# per-table int64 key columns that shift per replica
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def _suffix_tokens(col: pa.ChunkedArray, tag: str) -> pa.ChunkedArray:
    """token -> token_<tag> for every whitespace token (vectorized)."""
    # suffix at end-of-string and before every space
    out = pc.replace_substring_regex(col, pattern=r" ", replacement=f"_{tag} ")
    return pc.replace_substring_regex(out, pattern=r"$", replacement=f"_{tag}")


def scale_table(name: str, src: str, dst: str, factor: int) -> int:
    """Write each replica as its own row-group batch instead of
    concatenating ``factor`` copies in memory — at factor 100 (sf10) the
    concat form would hold multi-GB of lineitem in one arrow table."""
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    n_rows = 0
    with pq.ParquetWriter(os.path.join(dst, f"{name}.parquet"), t.schema) as w:
        for i in range(factor):
            r = t
            if i > 0:
                for k in KEY_COLS.get(name, []):
                    idx = r.schema.get_field_index(k)
                    shifted = pc.add(
                        r.column(k), pa.scalar(i * OFFSET, r.schema.field(k).type)
                    )
                    r = r.set_column(idx, r.schema.field(k), shifted)
                if name == "documents":
                    idx = r.schema.get_field_index("text")
                    r = r.set_column(
                        idx,
                        r.schema.field("text"),
                        _suffix_tokens(r.column("text"), str(i)),
                    )
            w.write_table(r)
            n_rows += r.num_rows
    return n_rows


def build(factor: int = 10, src: str = "/root/testdata/sf0.1",
          dst: str = "/tmp/sf1", verbose: bool = True) -> None:
    """Importable entry point (bench.py builds the sf1 sweep data on demand)."""
    os.makedirs(dst, exist_ok=True)
    for name in COPY_ONLY:
        n = scale_table(name, src, dst, 1)
        if verbose:
            print(f"{name}: {n} rows (copied)")
    for name in KEY_COLS:
        n = scale_table(name, src, dst, factor)
        if verbose:
            print(f"{name}: {n} rows (x{factor})")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    build(factor, src, dst)


if __name__ == "__main__":
    main()
