#!/usr/bin/env python3
"""Materialize an Nx replica of a testdata dir for the scaled
CORRECTNESS pass (driver-side helper, like check_oracle.py — NOT part
of the library).

Usage: python3 tools/make_scale_dir.py <src_dir> <out_dir> [n=10]

Re-running the full oracled suite against a corpus 10x the fixture
answers "are the ANSWERS still right at scale" (AQE plan flips,
broadcast-threshold bailouts, size-dependent determinism) — which the
wall-time scaling sidecars cannot. Built with pyarrow so every parquet
logical type survives byte-for-byte (Spark cannot round-trip the
events fixture's TIMESTAMP(NANOS) column, which the DuckDB oracles
depend on).

Replicas scale the way a real warehouse does — facts replicate,
dimensions stay fixed:
  - region/nation copy through unchanged;
  - each fact table shifts its OWN keys and its foreign keys into
    sibling facts by k * 10^7 per replica (orders->customer,
    lineitem->orders/part/supplier stay referentially intact inside a
    replica); dimension references (nationkey) are untouched;
  - documents get a per-replica token suffix (the BenchOpsScale
    bijection: within-replica shingle/dedup structure is exactly the
    fixture's, cross-replica overlap zero) plus the id shift;
  - embeddings replicate with shifted ids and IDENTICAL vectors — the
    near-dup/ANN operators must agree with the oracle on the enlarged
    duplicate groups, deliberately harsher than the fixture.
"""
import sys, os, shutil
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SHIFT = 10_000_000

# table -> key columns shifted per replica (facts only; dims absent)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replica(tbl: pa.Table, table: str, k: int) -> pa.Table:
    cols = []
    for name in tbl.column_names:
        col = tbl.column(name).combine_chunks()
        if name in KEYS.get(table, []):
            col = pc.add(col, pa.scalar(k * SHIFT, type=col.type))
        if table == "documents" and name == "text" and k > 0:
            # suffix every token: replicas are distinct documents with
            # the fixture's exact within-replica structure. Replica 0
            # stays the IDENTITY (as its key shift already is) so the
            # scaled pass contains the true fixture verbatim — token-
            # sensitive operators (stopword rules, language ID) keep a
            # non-degenerate slice instead of seeing only suffixed
            # pseudo-words.
            col = pc.replace_substring_regex(col, r"(\S+)", rf"\1w{k}")
        cols.append(col)
    return pa.table(dict(zip(tbl.column_names, cols)))


def main():
    src, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    for t in ["region", "nation"]:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied (dimension)")
    for t in KEYS:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        scaled = pa.concat_tables(replica(tbl, t, k) for k in range(n))
        pq.write_table(scaled, f"{out}/{t}.parquet")
        print(f"{t}: {len(tbl)} -> {len(scaled)} rows")
    print(f"wrote {n}x replica of {src} to {out}")


if __name__ == "__main__":
    main()
