#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB oracle.

Usage: python3 tools/compare_local.py <sfdir> <verify_out_dir>
"""
import json
import multiprocessing
import multiprocessing.connection
import os
import sys
import time

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def spark_ts_kinds(files):
    """Per-column timestamp kind from the PARQUET footer, not the fetched
    values: Spark writes LTZ as INT96 (or INT64 isAdjustedToUTC=true) and
    NTZ as INT64 isAdjustedToUTC=false, while DuckDB/pandas fetch both back
    as naive datetimes — which is exactly how the r12 j09/s60 LTZ leak
    passed this mimic while failing the driver's type-aware hasher."""
    kinds = {}
    sch = pq.ParquetFile(files[0]).schema
    for i in range(len(sch)):
        c = sch.column(i)
        if str(c.physical_type) == "INT96":
            kinds[c.name] = "ltz"
        elif c.logical_type is not None and \
                str(c.logical_type).startswith("Timestamp"):
            adj = "isAdjustedToUTC=true" in str(c.logical_type)
            kinds[c.name] = "ltz" if adj else "ntz"
    return kinds


def spark_decimal_cols(files):
    """DECIMAL output columns from the parquet footer. The driver's hasher
    represents decimals differently on its two sides (decimal128 parquet
    fetch vs the oracle's float conversion), so a value-equal decimal
    column still hash-fails — the r12/r13 j09/s60/s66 channel. Decimals
    must not reach the output surface at all (cast to DOUBLE/BIGINT)."""
    cols = []
    sch = pq.ParquetFile(files[0]).schema
    for i in range(len(sch)):
        c = sch.column(i)
        lt = str(c.logical_type) if c.logical_type is not None else ""
        if lt.startswith("Decimal") or \
                str(c.physical_type) == "FIXED_LEN_BYTE_ARRAY" and "Decimal" in lt:
            cols.append(c.name)
    return cols


def oracle_ts_kinds(con, sql):
    kinds = {}
    for row in con.execute(f"DESCRIBE ({sql})").fetchall():
        name, typ = row[0], row[1].upper()
        if typ.startswith("TIMESTAMP"):
            kinds[name] = "ltz" if "WITH TIME ZONE" in typ else "ntz"
    return kinds


def oracle_decimal_cols(con, sql):
    return [row[0] for row in con.execute(f"DESCRIBE ({sql})").fetchall()
            if row[1].upper().startswith("DECIMAL")]


def norm(rows):
    out = []
    for r in rows:
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(round(v, 9))
            else:
                row.append(v)
        out.append(tuple(row))
    return out


def _oracle_worker(sfdir, sql, outq):
    """Run one oracle in a CHILD process so a hard budget can kill it:
    duckdb's interrupt() is advisory (some operator states never check
    the flag — d56's sf1 replay ran 25 min past a 180 s interrupt), so
    the only reliable budget is process-level."""
    try:
        wcon = duckdb.connect()
        for t in TABLES:
            wcon.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        res = wcon.execute(sql)
        cols = [d[0] for d in res.description]
        outq.put(("ok", cols, res.fetchall()))
    except Exception as e:  # pragma: no cover - surfaced as FAIL upstream
        outq.put(("err", str(e), None))


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # GRAFT_ORACLE_TIMEOUT=<seconds>: per-entry budget for the DUCKDB
    # oracle replay, for above-gate-scale sweeps (sf1+) where a handful
    # of oracles are deliberately brute-force/recursive (d108's recursive
    # reach, m47's brute-force pair matrix) and cost hours the ENGINE
    # side doesn't — a timed-out entry reports ORACLE-TIMEOUT (the
    # oracle's cost, not a correctness verdict) instead of wedging the
    # whole sweep. Unset (the gate-scale default) = no budget, in-process.
    budget = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)
    mpctx = multiprocessing.get_context("fork")

    class OracleTimeout(Exception):
        pass

    class OracleCrashed(Exception):
        pass

    def run_budgeted(sql):
        """Returns (cols, rows); raises OracleTimeout past the budget, or
        OracleCrashed if the child DIES without a result (e.g. OOM-killed
        — the very scenario motivating the child process). Watching only
        the queue would mislabel a crash as a cost verdict AND stall the
        sweep for the whole budget per crashed oracle, so we wait on the
        queue's pipe and the process sentinel together."""
        if budget <= 0:
            res = con.execute(sql)
            return [d[0] for d in res.description], res.fetchall()
        outq = mpctx.Queue()
        proc = mpctx.Process(target=_oracle_worker, args=(sfdir, sql, outq))
        proc.start()
        deadline = time.monotonic() + budget
        status = None
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                proc.kill()
                proc.join()
                raise OracleTimeout()
            ready = multiprocessing.connection.wait(
                [outq._reader, proc.sentinel], timeout=remaining)
            if outq._reader in ready:
                # result (or worker-caught error) arrived before any exit
                status, a, b = outq.get()
                break
            if proc.sentinel in ready:
                # child exited; a result may still be in flight through the
                # queue's feeder pipe — drain briefly before declaring death
                try:
                    status, a, b = outq.get(timeout=2)
                    break
                except Exception:
                    code = proc.exitcode
                    proc.join()
                    raise OracleCrashed(
                        f"oracle child exited (code={code}) without a result")
        proc.join()
        if status == "err":
            raise RuntimeError(a)
        return a, b
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    import glob
    qdirs = sorted(d.split("/")[-1] for d in glob.glob(f"{outdir}/*")
                   if not d.endswith(".json"))
    n_ok = n_bad = n_slow = 0
    for q in qdirs:
        try:
            res = con.execute(
                f"SELECT * FROM '{outdir}/{q}/*.parquet'")
            cols = [d[0] for d in res.description]
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            rows = [tuple(r[i] for i in order) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {q}: cannot read result: {e}")
            n_bad += 1
            continue
        if q not in oracle:
            print(f"ROWS-ONLY {q}: {len(rows)} rows "
                  f"{'OK' if len(rows) > 0 else 'EMPTY!'}")
            continue
        try:
            ocols, oraw = run_budgeted(oracle[q])
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            orows = [tuple(r[i] for i in oorder) for r in oraw]
        except OracleTimeout:
            print(f"ORACLE-TIMEOUT {q}: oracle exceeded {budget:.0f}s "
                  f"(oracle cost, not a verdict; engine rows={len(rows)})",
                  flush=True)
            n_slow += 1
            continue
        except OracleCrashed as e:
            # distinct from TIMEOUT: the child died (OOM kill etc.) — an
            # environment outcome, not a cost verdict, and not a hash FAIL
            print(f"ORACLE-CRASHED {q}: {e} (engine rows={len(rows)})",
                  flush=True)
            n_slow += 1
            continue
        except Exception as e:
            print(f"FAIL {q}: oracle error: {e}")
            n_bad += 1
            continue
        scols = sorted(cols)
        socols = sorted(ocols)
        if scols != socols:
            print(f"FAIL {q}: column mismatch spark={scols} oracle={socols}")
            n_bad += 1
            continue
        qfiles = glob.glob(f"{outdir}/{q}/*.parquet")
        sk = spark_ts_kinds(qfiles)
        ok_kinds = oracle_ts_kinds(con, oracle[q])
        # a column classified as a timestamp by only ONE side is itself a
        # type mismatch — don't default each side to the other
        tsbad = [c for c in scols
                 if (c in sk) != (c in ok_kinds) or sk.get(c) != ok_kinds.get(c)]
        if tsbad:
            print(f"FAIL {q}: timestamp TYPE mismatch on {tsbad}: "
                  f"spark={{{', '.join(f'{c}:{sk.get(c)}' for c in tsbad)}}} vs "
                  f"oracle={{{', '.join(f'{c}:{ok_kinds.get(c)}' for c in tsbad)}}} "
                  f"(tz-aware vs naive hashes differently in the driver)")
            n_bad += 1
            continue
        decbad = sorted(set(spark_decimal_cols(qfiles))
                        | set(oracle_decimal_cols(con, oracle[q])))
        if decbad:
            print(f"FAIL {q}: DECIMAL output columns {decbad} — the driver "
                  f"hashes decimal128 vs float fetches differently even when "
                  f"value-equal (r13 j09/s60/s66); cast to DOUBLE/BIGINT on "
                  f"BOTH sides")
            n_bad += 1
            continue
        a, b = norm(rows), norm(orows)
        if a == b:
            print(f"OK   {q}: {len(rows)} rows")
            n_ok += 1
        else:
            print(f"FAIL {q}: spark {len(a)} rows vs oracle {len(b)} rows")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff at row {i}:\n   spark : {x}\n   oracle: {y}")
                    break
            else:
                if len(a) != len(b):
                    print(f"  extra rows, e.g. spark[-1]={a[-1] if a else None} "
                          f"oracle[-1]={b[-1] if b else None}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed, "
          f"{len(qdirs) - n_ok - n_bad - n_slow} rows-only"
          + (f", {n_slow} oracle-timeout" if n_slow else ""))


if __name__ == "__main__":
    main()
