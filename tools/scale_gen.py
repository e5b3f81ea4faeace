#!/usr/bin/env python3
"""Scale-multiply the driver testdata: K referentially-consistent copies.

Usage: python3 tools/scale_gen.py <src_sf_dir> <dst_dir> <K>

Copy 0 is byte-identical to the source (so fixed query sets keyed on low
ids still resolve); copy c offsets every key column of a key family by
c * (max(key)+1), applied consistently on both sides of every FK edge, so
joins produce exactly K disjoint copies of the original join graph.
Non-key payloads (text, embeddings, timestamps) repeat — which models a
real crawl/feed at K x density: duplicate clusters K x wider for the
dedup family, K x events per time window for the streaming family.

Schema fidelity matters more than speed here: output is written with the
SOURCE parquet schema object (timestamp[ns] events, list<float>
embeddings), because the engine's readers are pinned to the driver's
physical types.

NOTE: dev-only tooling (like check.py) — the engine itself is pure
Scala/Spark.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key family -> (table, column) sites that must shift together.
# A family spans EVERY column any query joins against any other member:
# events.user_id joins o_custkey/c_custkey (q_cogroup_typed, the stream-
# static join), so it shares the cust unit — a separate unit would make
# copy c's user ids collide with copy 0's custkeys and the scaled data
# would not be K disjoint copies of the original join graph. Likewise
# doc_id <-> vec_id correspondence (q_search_rrf fusion) shares one unit.
FAMILIES = {
    "cust": [("customer", "c_custkey"), ("orders", "o_custkey"),
             ("events", "user_id")],
    "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "ord":  [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "ev":   [("events", "event_id")],
    "doc":  [("documents", "doc_id"), ("embeddings", "vec_id")],
}
AS_IS = ["region", "nation"]
SCALED = ["customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def main():
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)

    tables = {t: pq.read_table(f"{src}/{t}.parquet")
              for t in AS_IS + SCALED}

    # one offset unit per family: max over every site of that key
    unit = {}
    for fam, sites in FAMILIES.items():
        unit[fam] = 1 + max(
            pc.max(tables[t][c]).as_py() for t, c in sites)

    shifts = {}  # (table, column) -> unit
    for fam, sites in FAMILIES.items():
        for t, c in sites:
            shifts[(t, c)] = unit[fam]

    for t in AS_IS:
        pq.write_table(tables[t], f"{dst}/{t}.parquet")

    for t in SCALED:
        base = tables[t]
        copies = []
        for c in range(k):
            if c == 0:
                copies.append(base)
                continue
            cols = []
            for name in base.column_names:
                col = base[name]
                u = shifts.get((t, name))
                if u is not None:
                    col = pc.add(col, pa.scalar(c * u, type=col.type))
                cols.append(col)
            copies.append(pa.table(dict(zip(base.column_names, cols)),
                                   schema=base.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
