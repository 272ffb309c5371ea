#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verifyOutDir> <sfDir>

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares: column names (sorted), row
count, and a hash of the value matrix with rows+columns sorted.
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_matrix(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], mat


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    # big-SF runs on a busy box can fail thread/buffer allocation with
    # DuckDB's defaults (nproc threads, 80%-RAM limit) — cap via env
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads TO {int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            n_fail += 1
            continue
        # run the DuckDB oracle BEFORE touching the engine parquet:
        # pyarrow's allocator state can make a subsequent memory-heavy
        # DuckDB query fail spuriously (observed: q_dedup_winnowing at
        # sf0.1 OOMs iff an arrow read precedes it in the process)
        if name in oracles:
            try:
                rel = con.sql(oracles[name])
                ocols = list(rel.columns)
                # guard: the driver's canonicalization hashes DuckDB
                # HUGEINT (uncast integer sum()) and DECIMAL columns
                # differently from the engine's BIGINT/DOUBLE even when
                # values agree — 7 gates went driver-red in round 8 this
                # way. Fail loudly HERE so the class never reaches the
                # driver: every oracle column must be cast to
                # BIGINT/DOUBLE explicitly.
                badtypes = [(c, str(t)) for c, t in zip(ocols, rel.types)
                            if str(t) in ("HUGEINT", "UHUGEINT")
                            or str(t).startswith("DECIMAL")]
                if badtypes:
                    results[name] = f"ORACLE_TYPE_DRIFT {badtypes}"
                    n_fail += 1
                    continue
                orows = rel.fetchall()
            except Exception as e:
                results[name] = f"ORACLE_ERROR: {e}"
                n_fail += 1
                continue
        tbl = pq.read_table(files[0])
        scols = tbl.column_names
        data = tbl.to_pydict()
        srows = list(zip(*[data[c] for c in scols])) if scols else []
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(srows)})"
            n_pass += 1
            continue
        sc, sm = table_matrix(scols, srows)
        oc, om = table_matrix(ocols, orows)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
            n_fail += 1
        elif len(sm) != len(om):
            results[name] = f"ROWCOUNT spark={len(sm)} oracle={len(om)}"
            n_fail += 1
        elif sm != om:
            diffs = [(a, b) for a, b in zip(sm, om) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
            n_fail += 1
        else:
            results[name] = f"OK({len(sm)})"
            n_pass += 1
    for name in names:
        status = results[name]
        flag = "PASS" if status.startswith(("OK", "ROWS_ONLY")) else "FAIL"
        print(f"{flag}  {name}: {status[:300]}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    # Persist the compare result so the round artifact exists even if
    # stdout is lost (two rounds running the driver's CORRECTNESS came
    # back empty; the repo-root summary is the durable fallback).
    # GRAFT_CHECK_SUMMARY overrides the output path; chunked sf0.1 runs
    # point it at per-chunk files and merge afterwards.
    summary_path = os.environ.get(
        "GRAFT_CHECK_SUMMARY",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "CORRECTNESS_SUMMARY.json"))
    summary = {"pass": n_pass, "fail": n_fail, "sf_dir": sf_dir,
               "queries": {n: results[n][:300] for n in names}}
    if summary_path and summary_path != "-":
        # merge into an existing summary (chunked runs append)
        if os.environ.get("GRAFT_CHECK_MERGE") and os.path.exists(summary_path):
            try:
                prev = json.load(open(summary_path))
                merged = dict(prev.get("queries", {}))
                merged.update(summary["queries"])
                ok = ("OK", "ROWS_ONLY")
                summary = {
                    "pass": sum(1 for v in merged.values() if v.startswith(ok)),
                    "fail": sum(1 for v in merged.values() if not v.startswith(ok)),
                    "sf_dir": sf_dir, "queries": merged}
            except Exception as e:
                print(f"WARN: could not merge {summary_path}: {e}")
        tmp = summary_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        os.replace(tmp, summary_path)
        print(f"wrote {summary_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
