#!/usr/bin/env python3
"""Scale-up replica generator for the sf1 self-gate.

Replicates an sf directory N times with per-replica key offsets: every
replica is a disjoint key universe (series, documents, vectors, orders),
so per-series/per-group query semantics and tie behavior match the source
scale exactly, while data volume grows N-fold. Dimension tables
(region/nation/supplier/part) are shared, keeping TPC-H joins consistent.

events.parquet is replicated via pyarrow to preserve its timestamp[ns]
physical type (the Spark reader's `ts div 1000` contract); everything else
goes through DuckDB.

Usage: make_sf_replica.py SRC_DIR DST_DIR [N=10]
"""
import sys
import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 1_000_000_000  # per-replica key offset; far above any source key

def replicate_events(src, dst, n):
    t = pq.read_table(f"{src}/events.parquet")
    parts = []
    for i in range(n):
        p = t
        for key in ("event_id", "user_id"):
            idx = p.schema.get_field_index(key)
            p = p.set_column(idx, key, pc.add(p.column(key), i * OFF))
        parts.append(p)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/events.parquet")

def replicate_sql(con, src, dst, table, select):
    con.execute(
        f"COPY (SELECT {select} FROM read_parquet('{src}/{table}.parquet'), "
        f"range(REPS) t(i)) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")

def copy_plain(con, src, dst, table):
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
        f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)")

def main():
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 8")
    rep = lambda s: s.replace("REPS", str(n)).replace("OFF", str(OFF))
    for tbl in ("region", "nation", "supplier", "part"):
        copy_plain(con, src, dst, tbl)
    con.execute(rep(
        f"COPY (SELECT c_custkey + i*OFF AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM read_parquet('{src}/customer.parquet'), "
        f"range(REPS) t(i)) TO '{dst}/customer.parquet' (FORMAT PARQUET)"))
    con.execute(rep(
        f"COPY (SELECT o_orderkey + i*OFF AS o_orderkey, o_custkey + i*OFF AS "
        f"o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        f"FROM read_parquet('{src}/orders.parquet'), range(REPS) t(i)) "
        f"TO '{dst}/orders.parquet' (FORMAT PARQUET)"))
    con.execute(rep(
        f"COPY (SELECT l_orderkey + i*OFF AS l_orderkey, l_partkey, l_suppkey, "
        f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate "
        f"FROM read_parquet('{src}/lineitem.parquet'), range(REPS) t(i)) "
        f"TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"))
    con.execute(rep(
        f"COPY (SELECT doc_id + i*OFF AS doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{src}/documents.parquet'), range(REPS) t(i)) "
        f"TO '{dst}/documents.parquet' (FORMAT PARQUET)"))
    con.execute(rep(
        f"COPY (SELECT vec_id + i*OFF AS vec_id, embedding, label "
        f"FROM read_parquet('{src}/embeddings.parquet'), range(REPS) t(i)) "
        f"TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"))
    replicate_events(src, dst, n)
    for row in con.execute(
            f"SELECT 'lineitem', count(*) FROM read_parquet('{dst}/lineitem.parquet') "
            f"UNION ALL SELECT 'events', count(*) FROM read_parquet('{dst}/events.parquet') "
            f"UNION ALL SELECT 'documents', count(*) FROM read_parquet('{dst}/documents.parquet')").fetchall():
        print(row)

if __name__ == "__main__":
    main()
