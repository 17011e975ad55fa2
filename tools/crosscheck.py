#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Reads each parquet result under OUT_DIR (written by graft.Verify), runs the
matching SQL from OUT_DIR/oracle_sql.json in DuckDB over the same sf
directory's parquet tables, and compares as order-insensitive multisets
(columns sorted by name, values stringified). Usage:

    python3 tools/crosscheck.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(round(v, 9))
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not pq:
            print(f"MISS  {name}: no spark output")
            failed.append(name)
            continue
        got = con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{p}'" for p in sorted(pq)) + "])")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        try:
            exp = con.execute(sql)
        except Exception as e:
            print(f"ERR   {name}: oracle SQL failed: {e}")
            failed.append(name)
            continue
        exp_cols = [d[0] for d in exp.description]
        exp_rows = exp.fetchall()
        if sorted(got_cols) != sorted(exp_cols):
            print(f"SCHEMA {name}: spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            failed.append(name)
            continue
        g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if g == e:
            print(f"OK    {name}: {len(g)} rows")
        else:
            print(f"FAIL  {name}: spark {len(g)} rows vs oracle {len(e)} rows")
            only_g = [x for x in g if x not in set(e)][:3]
            only_e = [x for x in e if x not in set(g)][:3]
            for x in only_g: print(f"   spark-only: {x[:200]}")
            for x in only_e: print(f"   oracle-only: {x[:200]}")
            failed.append(name)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
