#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the fixture tables, compare against the engine's parquet dump
(column names, row count, and exact values after sorting columns by name and
rows by value). Dev tooling only — the Scala library has no Python dependency.

Usage: python3 tools/check.py <sf|sfDir> [verifyOutDir=/tmp/vout]
e.g.   python3 tools/check.py sf0.01
"""
import json, sys, math, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything so dtype differences (int32/int64, us/ns) vanish;
    # floats via repr (bit-exact compare), NaN/None normalized.
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def sf_bound(sql: str) -> bool:
    """True when the oracle actually reads the fixture tables (a VALUES-only
    oracle times ~0 in DuckDB and would make the engine/oracle ratio
    meaningless — those queries exercise engine-only machinery)."""
    low = sql.lower()
    return any(f" {t}" in low or f"'{t}" in low for t in TABLES)


def main(sf_dir: str, out_dir: str, times_out: str | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    times: dict[str, dict] = {}
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            t0 = time.perf_counter()
            want = con.execute(sql).fetchdf()
            times[name] = {"sec": round(time.perf_counter() - t0, 6),
                           "sf_bound": sf_bound(sql)}
            g, w = norm(got), norm(want)
            cols = list(g.columns) == list(w.columns)
            rows = len(g) == len(w)
            vals = cols and rows and g.equals(w)
            status = "OK" if (cols and rows and vals) else "FAIL"
            if status == "FAIL":
                n_bad += 1
                print(f"{status:4} {name}: cols={cols} rows={rows}({len(g)}/{len(w)}) vals={vals}")
                if cols and rows and not vals:
                    diff = (g != w).any(axis=1)
                    print("  first diffs (got vs want):")
                    print(pd.concat([g[diff].head(3), w[diff].head(3)],
                                    keys=["got", "want"]).to_string()[:2000])
            else:
                print(f"{status:4} {name} ({len(g)} rows)")
        except Exception as e:
            n_bad += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} oracle-matched")
    if times_out:
        # Per-query DuckDB oracle wall time, keyed by sf dir basename. Bench
        # (graft.Bench) merges the matching file into its JSON as oracle_sec
        # + ratio so "within 2x of DuckDB" is a computed column.
        payload = {"sf": sf_dir.rstrip("/").split("/")[-1], "times": times}
        with open(times_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"oracle times -> {times_out}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    sf = args[0]
    if not sf.startswith("/"):
        sf = f"/root/testdata/{sf}"
    out = args[1] if len(args) > 1 else "/tmp/vout"
    times_out = None
    for fl in flags:
        if fl.startswith("--times-out="):
            times_out = fl.split("=", 1)[1]
    sys.exit(main(sf, out, times_out))
