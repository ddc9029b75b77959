#!/usr/bin/env python3
"""Build an R-times scaled replica of a testdata warehouse for
above-gate oracle validation (the driver's SF ladder stops at sf0.1;
this synthesizes the next rung so Spark-vs-DuckDB comparisons can run at
~sf1 volume and surface scale-revealed oracle bugs — overflow, fixed
thresholds, tie-break gaps).

Replication preserves referential integrity by shifting every key
family by a per-replica offset chosen far above any real id and far
from the literal id offsets oracle fixtures use (the merge keys add
10^6 to doc_id, so documents shift by 10^7):

  customer/supplier/part/documents/embeddings ids : + r * 10^7
  orders/lineitem orderkey, events event_id       : + r * 10^8
  events user_id                                  : + r * 10^7

region/nation are dimension-constant and copy as-is. Both engines read
the same files, so every oracle comparison stays valid on the replica.

Usage: python3 tools/make_scaled_warehouse.py <srcDir> <outDir> [R=10] [tables]

The optional 4th arg is a comma-separated subset of tables to replicate
(e.g. `lineitem,events,documents,embeddings` for the 100x big-table
build); tables outside the subset copy through UNCHANGED at source
scale. Cross-family joins between a replicated fact and an
un-replicated parent are NOT referentially closed in that mode — use it
only for the single-table-family scale curves it exists for.
"""
import sys, os
import duckdb

src = sys.argv[1]
out = sys.argv[2]
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
subset = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
os.makedirs(out, exist_ok=True)

KEY = 10_000_000      # entity-id stride (custkey, suppkey, partkey, doc_id, vec_id, user_id)
ORD = 100_000_000     # event/order-id stride

SHIFTS = {
    "region": None,
    "nation": None,
    "customer": {"c_custkey": KEY},
    "supplier": {"s_suppkey": KEY},
    "part": {"p_partkey": KEY},
    "orders": {"o_orderkey": ORD, "o_custkey": KEY},
    "lineitem": {"l_orderkey": ORD, "l_partkey": KEY, "l_suppkey": KEY},
    "events": {"event_id": ORD, "user_id": KEY},
    "documents": {"doc_id": KEY},
    "embeddings": {"vec_id": KEY},
}

con = duckdb.connect()
for table, shifts in SHIFTS.items():
    p = f"{src}/{table}.parquet"
    cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{p}'").fetchall()]
    if subset is not None and table not in subset:
        shifts = None  # outside the subset: copy through at source scale
    if shifts is None:
        sql = f"SELECT * FROM '{p}'"
    else:
        parts = []
        for r in range(R):
            sel = ", ".join(
                f"{c} + {r * shifts[c]} AS {c}" if c in shifts else c
                for c in cols)
            parts.append(f"SELECT {sel} FROM '{p}'")
        sql = " UNION ALL ".join(parts)
    con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")
print("done:", out)
