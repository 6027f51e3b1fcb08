#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Reads <outdir>/<name>/ parquet dirs (written by graft.Verify) and
<outdir>/oracle_sql.json, runs each oracle against DuckDB views over the
same sf dir, sorts columns by name, and compares values. Exit 1 on any
mismatch. Usage: check_oracle.py [sfdir] [outdir]
"""
import sys, os, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and ULP noise that survived rounding
        return round(v, 9) + 0.0
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v

def rows_of(df):
    cols = sorted(df.columns)
    recs = df[cols].to_dict("records")
    return cols, [tuple(norm(r[c]) for c in cols) for r in recs]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written tier (e.g. ScaleGen output)
            src = f"'{p}/*.parquet'"
        elif os.path.exists(p):
            src = f"'{p}'"
        else:
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        if t == "events":
            # ScaleGen tiers carry ts as raw INT64 nanos (the same physical
            # value the engine's read shim consumes); normalize the view to
            # the TIMESTAMP the driver testdata presents
            (ts_type,) = [r[1] for r in con.execute("DESCRIBE events").fetchall()
                          if r[0] == "ts"]
            if ts_type == "BIGINT":
                con.execute(
                    "CREATE OR REPLACE VIEW events AS SELECT event_id, "
                    "make_timestamp(ts // 1000) AS ts, user_id, event_type, "
                    f"value, props FROM {src}")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"  {name:28s} rows-only: {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            if len(got) == 0:
                failures += 1
            continue
        exp = con.execute(oracle[name]).fetchdf()
        gc, gr = rows_of(got)
        ec, er = rows_of(exp)
        if gc != ec:
            print(f"  {name:28s} SCHEMA MISMATCH spark={gc} duck={ec}")
            failures += 1
            continue
        if gr == er:
            print(f"  {name:28s} OK ({len(gr)} rows)")
            continue
        failures += 1
        if len(gr) != len(er):
            print(f"  {name:28s} ROWCOUNT spark={len(gr)} duck={len(er)}")
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b]
            print(f"  {name:28s} VALUES differ in {len(diffs)}/{len(gr)} rows; first:")
            for i, a, b in diffs[:3]:
                print(f"      row {i} cols={gc}\n       spark={a}\n       duck ={b}")
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({len(names)} queries, {failures} failures)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
