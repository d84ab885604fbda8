#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: for each query in
outDir/oracle_sql.json, run the SQL in DuckDB over the sf parquet tables and
compare with the Spark result parquet (columns sorted by name, rows sorted,
values normalized). Usage: check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    raw = json.load(open(f"{out_dir}/oracle_sql.json"))
    # oracle_sql.json is dual-keyed (bare name AND name.parquet) for the
    # driver's benefit; normalize to bare names here.
    oracle = {k.removesuffix(".parquet"): v for k, v in raw.items()}
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        try:
            cur = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}.parquet/*.parquet')")
            scols = [d[0] for d in cur.description]
            srows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns oracle={sorted(ocols)} spark={sorted(scols)}")
            continue
        ok_, sk_ = table_key(orows, ocols), table_key(srows, scols)
        if ok_ == sk_:
            n_ok += 1
            print(f"OK   {name} ({len(srows)} rows)")
        else:
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            for i, (a, b) in enumerate(zip(ok_, sk_)):
                if a != b:
                    print(f"  first diff at sorted row {i}:\n   oracle={a}\n   spark ={b}")
                    break
            else:
                # zipped prefix agrees: show what each side has that the
                # other lacks (prefix tails can be empty and useless here)
                only_o = [r for r in ok_ if r not in set(sk_)][:2]
                only_s = [r for r in sk_ if r not in set(ok_)][:2]
                print(f"  rows only in oracle={only_o}; rows only in spark={only_s}")
    print(f"\n{n_ok}/{len(oracle)} queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
