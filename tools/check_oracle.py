#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
statement in DuckDB over the parquet tables in <sfDir>, and compares with
the parquet result Verify dumped, after sorting columns by name and rows
by all columns. Reports per-query PASS/FAIL with first differences.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class NestedColumnError(TypeError):
    """A result column carries struct/array cells the DRIVER's compare
    cannot sort (pandas lexsort throws `unhashable type: 'dict'` /
    'numpy.ndarray'). Round 17 shipped q195/q196/q210 green locally
    because this checker stringified those cells — a gate laxer than
    the driver's. Now they fail loudly in-repo: flatten the output or
    serialize it to one string column ON BOTH ENGINES instead."""


def _reject_nested(df: pd.DataFrame, side: str) -> None:
    import numpy as np
    nested = (dict, list, tuple, set, np.ndarray)
    for c in df.columns:
        if df[c].dtype == object and \
                df[c].dropna().map(lambda v: isinstance(v, nested)).any():
            raise NestedColumnError(
                f"{side} column {c!r} holds struct/array cells — not "
                "driver-checkable; flatten or canonical-string it on both engines")


def canon(df: pd.DataFrame, side: str = "result") -> pd.DataFrame:
    _reject_nested(df, side)
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp resolutions (ns vs us) to us
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, only: str = "") -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    keep = {n.strip() for n in only.split(",") if n.strip()}
    unknown = keep - set(oracle)
    if keep and unknown:
        # a typo'd filter must not print "0 pass / 0 fail" and exit 0
        print(f"WARNING: filter names not in oracle_sql.json: {sorted(unknown)}",
              file=sys.stderr)
    if keep and not (keep & set(oracle)):
        print("ERROR: query filter matched nothing; no checks ran", file=sys.stderr)
        return 2
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if keep and name not in keep:
            continue
        try:
            exp = con.sql(sql).df()
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp, got = canon(exp, "oracle"), canon(got, "spark")
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
                n_fail += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
                n_fail += 1
                continue
            # exact compare first; report max numeric diff on mismatch
            eq = exp.equals(got)
            if eq:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            else:
                print(f"FAIL {name}: value mismatch")
                for c in exp.columns:
                    if not exp[c].equals(got[c]):
                        if pd.api.types.is_numeric_dtype(exp[c]):
                            d = (exp[c] - got[c]).abs().max()
                            print(f"  col {c}: max abs diff {d}")
                        else:
                            m = exp[c] != got[c]
                            print(f"  col {c}: first diff exp={exp[c][m].iloc[0]!r} "
                                  f"got={got[c][m].iloc[0]!r}")
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


def selftest() -> int:
    """Standing gate on the gate (VERDICT r18 item 6): prove that a
    nested (struct/array) result column FAILS this checker the same way
    it would fail the driver's pandas-lexsort compare, and that the
    faithful replica of the driver's canonicalization (all-column
    lexsort + hash_pandas_object md5) agrees with canon() on a flat
    frame. Run `python3 tools/check_oracle.py --selftest` before
    committing any query whose OUTPUT SCHEMA changes; a zero exit means
    the gate still rejects what the driver cannot sort."""
    import hashlib
    import numpy as np
    failures = []
    # 1. nested cells must raise NestedColumnError (round-17 regression:
    #    this checker once stringified them and passed queries the
    #    driver then failed)
    for bad in (pd.DataFrame({"a": [1, 2], "s": [{"x": 1}, {"x": 2}]}),
                pd.DataFrame({"a": [1], "v": [np.array([1.0, 2.0])]}),
                pd.DataFrame({"a": [1], "l": [[1, 2]]})):
        try:
            canon(bad, "selftest")
            failures.append(f"nested column {list(bad.columns)} passed canon()")
        except NestedColumnError:
            pass
    # 2. flat frames sail through, and the driver-replica hash
    #    (columns sorted by name, rows lexsorted, md5 of
    #    hash_pandas_object) matches across column/row permutations —
    #    the property the driver's compare relies on
    flat = pd.DataFrame({"b": [2.0, 1.0], "a": ["y", "x"]})
    perm = pd.DataFrame({"a": ["x", "y"], "b": [1.0, 2.0]})

    def driver_hash(df: pd.DataFrame) -> str:
        c = canon(df, "selftest")
        return hashlib.md5(
            pd.util.hash_pandas_object(c, index=False).values.tobytes()).hexdigest()

    if driver_hash(flat) != driver_hash(perm):
        failures.append("driver-replica hash not permutation-invariant")
    if driver_hash(flat) == driver_hash(
            pd.DataFrame({"a": ["x", "y"], "b": [1.0, 3.0]})):
        failures.append("driver-replica hash blind to a value change")
    for f in failures:
        print(f"SELFTEST FAIL: {f}")
    print(f"== selftest {'FAILED' if failures else 'passed'}: nested-output "
          f"rejection + driver-hash replica ==")
    return 1 if failures else 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else ""))
