#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same parquet tables
and compare rows / schema (column names, sorted) / value hash.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(norm(r[i]) for i in order) + "\x1e").encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    key_drift = []
    for d in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
        name = os.path.basename(d)[:-len(".parquet")]
        # Driver contract check: the driver looks up oracles by the output
        # BASENAME including ".parquet". If an oracle exists under the bare
        # name but not the driver-style key, the driver would record
        # no_oracle — fail loudly so contract drift can't void a round.
        driver_key = os.path.basename(d)
        if name in oracles and driver_key not in oracles:
            key_drift.append(name)
        spark_tbl = pq.read_table(d)
        s_cols = list(spark_tbl.column_names)
        s_rows = [tuple(r[c] for c in s_cols) for r in spark_tbl.to_pylist()]
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(s_rows),
                             "ok": len(s_rows) > 0}
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            results[name] = {"status": "oracle_error", "ok": False,
                             "error": str(e)[:300]}
            continue
        schema_match = sorted(s_cols) == sorted(d_cols)
        rows_match = len(s_rows) == len(d_rows)
        hash_match = (schema_match and rows_match and
                      table_hash(s_cols, s_rows) == table_hash(d_cols, d_rows))
        results[name] = {"status": "oracle", "rows": len(s_rows),
                         "schema_match": schema_match,
                         "rows_match": rows_match, "hash_match": hash_match,
                         "ok": schema_match and rows_match and hash_match}
        if not results[name]["ok"]:
            # show first mismatching row for debugging
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
                sv = [norm(sr[j]) for j in order_s]
                dv = [norm(dr[j]) for j in order_d]
                if sv != dv:
                    results[name]["first_diff"] = {
                        "row": i, "spark": sv[:8], "duck": dv[:8],
                        "cols": sorted(s_cols)[:8]}
                    break
    bad = {k: v for k, v in results.items() if not v["ok"]}
    n_ok = sum(1 for v in results.values() if v["ok"])
    print(json.dumps(bad, indent=2, default=str))
    print(f"\n{n_ok}/{len(results)} OK "
          f"({sum(1 for v in results.values() if v['status']=='rows_only')} rows-only)")
    if key_drift:
        print(f"\nKEY DRIFT: {len(key_drift)} oracles resolvable by bare "
              f"name but NOT by the driver's '<name>.parquet' key — the "
              f"driver would grade these no_oracle: {key_drift}")
        return 1
    return 0 if not bad else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
