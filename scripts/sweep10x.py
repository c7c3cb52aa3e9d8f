#!/usr/bin/env python3
"""Builder-side 10x-replica correctness sweep with per-oracle timeouts.

Usage: python3 scripts/sweep10x.py <verify_out_dir> <sf_dir> [timeout_s]

Same canonical compare as check_oracle.py (column-name sort, row sort,
exact values), but each DuckDB oracle runs on a daemon thread with a
timeout so one pathological oracle (see the CTE-inlining note in the
verify skill) cannot hang the sweep. Results append to
<verify_out_dir>/sweep_results.jsonl as they land, so an interrupted
sweep resumes by skipping already-recorded names.
"""
import glob
import json
import os
import sys
import threading

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from check_oracle import TABLES, canon  # noqa: E402


def main(out_dir: str, sf_dir: str, timeout_s: float) -> int:
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results_path = f"{out_dir}/sweep_results.jsonl"
    done = set()
    if os.path.exists(results_path):
        with open(results_path) as f:
            done = {json.loads(l)["name"] for l in f if l.strip()}

    have = sorted(p.rstrip("/").split("/")[-1] for p in glob.glob(f"{out_dir}/*/"))
    n_pass = n_fail = n_timeout = 0
    for name in have:
        if name in done:
            continue
        rec = {"name": name}
        if name not in oracles:
            try:
                rows = len(pd.read_parquet(f"{out_dir}/{name}"))
                rec.update(status="rows_only", rows=rows)
                n_pass += rows > 0
                n_fail += rows == 0
            except Exception as e:
                rec.update(status="error", detail=str(e)[:300])
                n_fail += 1
        else:
            holder = []

            # nm AND out bound as defaults: the loop body shares one scope,
            # so a closure over `holder` would let a TIMED-OUT thread's late
            # append land in a LATER query's list (observed: q108's
            # triangles oracle result compared against q120)
            def run(nm=name, out=holder):
                # fresh connection per query: a timed-out thread keeps its
                # connection; the sweep moves on with a new one
                con = duckdb.connect()
                for t in TABLES:
                    p = f"{sf_dir}/{t}.parquet"
                    if os.path.isdir(p):
                        p = f"{p}/*.parquet"
                    elif not os.path.exists(p):
                        continue  # partial replicas (e.g. the dedup one) ship only documents
                    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
                want = canon(con.sql(oracles[nm]).df())
                out.append(want)

            try:
                got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            except Exception as e:
                rec.update(status="error", detail=f"spark output unreadable: {e}"[:300])
                n_fail += 1
                got = None
            if got is not None:
                th = threading.Thread(target=run, daemon=True)
                th.start()
                th.join(timeout_s)
                if not holder:
                    rec.update(status="oracle_timeout", timeout_s=timeout_s)
                    n_timeout += 1
                else:
                    want = holder[0]
                    if list(got.columns) != list(want.columns):
                        rec.update(status="fail", detail="columns differ",
                                   spark_cols=list(got.columns), duck_cols=list(want.columns))
                        n_fail += 1
                    elif len(got) != len(want):
                        rec.update(status="fail",
                                   detail=f"rowcount spark={len(got)} duck={len(want)}")
                        n_fail += 1
                    elif not got.equals(want):
                        neq = (got != want).any(axis=1)
                        first = got[neq].head(2).to_dict("records")
                        firstw = want[neq].head(2).to_dict("records")
                        rec.update(status="fail", detail=f"{int(neq.sum())}/{len(got)} rows differ",
                                   spark_first=str(first)[:400], duck_first=str(firstw)[:400])
                        n_fail += 1
                    else:
                        rec.update(status="pass", rows=len(got))
                        n_pass += 1
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{rec.get('status','?'):>14} {name} {rec.get('detail','')}", flush=True)
    print(f"== pass={n_pass} fail={n_fail} timeout={n_timeout}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 120.0))
