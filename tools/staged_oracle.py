#!/usr/bin/env python3
"""Staged DuckDB replay of ONE oracle query: materialize each top-level
CTE as a TEMP TABLE in definition order (bodies reference earlier stages
by name, so the SQL text is reused verbatim), run the recursive tail
standalone, and compare against the Spark parquet exactly like
check_oracle.py.

Why: DuckDB's one-shot planner handles the composite e2e replays badly
at sf1 (CTE inlining re-evaluates heavy chains per reference; the
recursive block defeats materialization hints) — staging isolates each
chain, gives per-stage timings, and keeps the math identical.

Usage: python3 tools/staged_oracle.py <sfdir> <outdir> <query>
"""
import json, math, re, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def split_ctes(sql):
    """Split 'WITH [RECURSIVE] a AS (...), b AS (...) SELECT ...' into
    ([(name, body)], final_select) by top-level paren tracking."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.S | re.I)
    i = m.end()
    ctes = []
    while True:
        m = re.match(r"\s*([a-zA-Z0-9_]+)\s+AS\s+\(", sql[i:])
        if not m:
            break
        name = m.group(1)
        j = i + m.end()          # first char inside the paren
        depth = 1
        k = j
        while depth > 0 and k < len(sql):
            c = sql[k]
            if c == "'":
                # skip string literals so quoted parens ('(' / ')') and
                # escaped quotes ('') can't corrupt the depth count
                k += 1
                while k < len(sql):
                    if sql[k] == "'":
                        if k + 1 < len(sql) and sql[k + 1] == "'":
                            k += 2
                            continue
                        break
                    k += 1
            elif c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            k += 1
        if depth > 0:
            raise ValueError(f"unbalanced parens in CTE body '{name}'")
        ctes.append((name, sql[j:k - 1]))
        i = k
        m2 = re.match(r"\s*,", sql[i:])
        if not m2:
            break
        i += m2.end()
    return ctes, sql[i:]


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(canon(x) for x in v)
    return (type(v).__name__, str(v))


def rows_key(df):
    cols = sorted(df.columns)
    out = [tuple(canon(v) for v in t)
           for t in df[cols].itertuples(index=False, name=None)]
    out.sort()
    return cols, out


def main():
    sfdir, outdir, qname = sys.argv[1], sys.argv[2], sys.argv[3]
    sql = json.load(open(f"{outdir}/oracle_sql.json"))[qname]
    ctes, final = split_ctes(sql)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    # a recursive CTE references itself — keep it (and everything after
    # it) in the final WITH block instead of materializing
    tail_from = next((i for i, (n, b) in enumerate(ctes)
                      if re.search(rf"\b{n}\b", b)), len(ctes))
    for name, body in ctes[:tail_from]:
        t0 = time.time()
        con.execute(f"CREATE TEMP TABLE {name} AS {body}")
        n = con.sql(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"stage {name:10s} rows={n:>14,} {time.time()-t0:8.1f}s",
              flush=True)
    tail = ctes[tail_from:]
    q = final if not tail else (
        "WITH RECURSIVE " +
        ", ".join(f"{n} AS ({b})" for n, b in tail) + " " + final)
    t0 = time.time()
    odf = con.sql(q).df()
    print(f"stage <final>    rows={len(odf):>14,} {time.time()-t0:8.1f}s",
          flush=True)
    mdf = con.sql(
        f"SELECT * FROM read_parquet('{outdir}/{qname}/*.parquet')").df()
    ocols, orows = rows_key(odf)
    mcols, mrows = rows_key(mdf)
    if ocols != mcols:
        print(f"FAIL {qname}: columns differ oracle={ocols} mine={mcols}")
        sys.exit(1)
    if orows != mrows:
        bad = sum(1 for a, b in zip(orows, mrows) if a != b) + \
            abs(len(orows) - len(mrows))
        print(f"FAIL {qname}: {bad} row diffs "
              f"(oracle {len(orows)} vs mine {len(mrows)})")
        sys.exit(1)
    print(f"PASS {qname} ({len(orows)} rows)")


if __name__ == "__main__":
    main()
