#!/usr/bin/env python3
"""Driver-mimic: compare Verify output parquet vs DuckDB oracle SQL."""
import duckdb, json, sys, glob

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout0"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"create view {t} as select * from '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracles.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name:28s} MISSING spark output"); fails.append(name); continue
    try:
        con.sql(f"create or replace view spark_res as select * from parquet_scan('{outdir}/{name}/*.parquet')")
        con.sql(f"create or replace view oracle_res as ({sql})")
        scols = sorted(c[0] for c in con.sql("describe spark_res").fetchall())
        ocols = sorted(c[0] for c in con.sql("describe oracle_res").fetchall())
        if scols != ocols:
            print(f"{name:28s} COLUMN MISMATCH spark={scols} oracle={ocols}")
            fails.append(name); continue
        cols = ", ".join(f'"{c}"' for c in scols)
        nd = con.sql(f"""select
          (select count(*) from (select {cols} from spark_res except all select {cols} from oracle_res)),
          (select count(*) from (select {cols} from oracle_res except all select {cols} from spark_res)),
          (select count(*) from spark_res), (select count(*) from oracle_res)""").fetchone()
        if nd[0] == 0 and nd[1] == 0:
            print(f"{name:28s} OK rows={nd[2]}")
        else:
            print(f"{name:28s} DIFF spark-only={nd[0]} oracle-only={nd[1]} rows={nd[2]}/{nd[3]}")
            fails.append(name)
    except Exception as e:
        print(f"{name:28s} ERROR {str(e)[:300]}")
        fails.append(name)
print()
print("FAILED:", fails if fails else "none", f"({len(oracles)-len(fails)}/{len(oracles)} pass)")
sys.exit(1 if fails else 0)
