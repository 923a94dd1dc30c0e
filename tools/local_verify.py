#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs each oracle_sql.json entry in DuckDB over the sf-dir parquet tables,
loads the matching Spark result parquet dumped by graft.Verify, sorts
columns by name and rows by all columns, and compares cell values.
Exact string-repr equality is the pass bar (mirrors the driver's value
hash); float cells additionally get a 1e-9 relative-tolerance fallback
reported as WARN (would likely hash-mismatch in the real gate).

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, math, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # the driver's gate passes decimal-vs-double matches (r03
        # q_flagship_agg); normalize scale so 361346.4960 == 361346.496
        return repr(float(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def load_sorted(con, rel_sql):
    # Fetch through arrow, not fetchall: DuckDB HUGEINT (the type of
    # sum() over integers) becomes int via fetchall but decimal128(38,0)
    # via arrow — the driver's gate sees the decimal form, and an
    # integer-valued decimal normalizes to "123.0" vs Spark's "123".
    # fetchall-based verification silently hid that class of mismatch
    # for two rounds (the 7 persistent hash-fails).
    tbl = con.execute(rel_sql).fetch_arrow_table()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda r: tuple(norm_cell(c) for c in r))
    return [cols[i] for i in order], out


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        res = {"rows_match": False, "schema_match": False,
               "hash_match": False, "err": None}
        try:
            if not os.path.isdir(spark_dir):
                raise RuntimeError("no spark result dir (query failed?)")
            scols, srows = load_sorted(
                con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            ocols, orows = load_sorted(con, oracle[name])
            res["spark_rows"], res["oracle_rows"] = len(srows), len(orows)
            res["rows_match"] = len(srows) == len(orows)
            res["schema_match"] = [c.lower() for c in scols] == [
                c.lower() for c in ocols]
            if not res["schema_match"]:
                res["err"] = f"schema spark={scols} oracle={ocols}"
            elif res["rows_match"]:
                exact = True
                warn = False
                for sr, orr in zip(srows, orows):
                    for a, b in zip(sr, orr):
                        if norm_cell(a) != norm_cell(b):
                            if close(a, b):
                                warn = True
                            else:
                                exact = False
                                res["err"] = (res["err"] or
                                              f"value spark={a!r} oracle={b!r}")
                                break
                    if not exact:
                        break
                res["hash_match"] = exact and not warn
                if exact and warn:
                    res["err"] = "float-tolerance only (would hash-mismatch?)"
                    res["hash_match"] = False
                    res["float_warn"] = True
        except Exception as e:
            res["err"] = str(e)[:300]
        results[name] = res
        ok = res["rows_match"] and res["schema_match"] and res["hash_match"]
        print(f"{'PASS' if ok else 'FAIL':4} {name:28} "
              f"rows={res.get('spark_rows','-')}/{res.get('oracle_rows','-')} "
              f"{'' if ok else res['err']}")
    fails = [n for n, r in results.items()
             if not (r["rows_match"] and r["schema_match"] and r["hash_match"])]
    print(f"\n{len(results) - len(fails)}/{len(results)} green; fails: {fails}")
    json.dump(results, open("/tmp/local_correctness.json", "w"), indent=1)


if __name__ == "__main__":
    main()
