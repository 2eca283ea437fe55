#!/usr/bin/env python3
"""Self-test for check.py's gate-completeness guards.

The correctness gate has two silent-shrink failure modes, both hit in
earlier rounds: a query that THROWS in Verify writes no result dir
(round 10: q41/q48 vanished when the testdata timestamp type changed),
and an oracle key whose query was renamed compares nothing. This
builds tiny fixture dumps and asserts check.py fails loudly on each —
including a registered query with NO oracle entry, which since round
16 is itself a failure (the rows-only carve-out is retired).

Usage: python3 scripts/check_selftest.py   (exit 0 = all guards hold)
"""
import json, os, shutil, subprocess, sys, tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))


def run_check(sf, out):
    return subprocess.run(
        [sys.executable, os.path.join(HERE, "check.py"), sf, out],
        capture_output=True, text=True,
        env={k: v for k, v in os.environ.items()
             if k != "SPARK_GRAFT_VERIFY_ONLY"})


def write_result(out, name, sql="SELECT 1 AS x"):
    d = os.path.join(out, name)
    os.makedirs(d, exist_ok=True)
    duckdb.sql(f"COPY ({sql}) TO '{d}/part-0.parquet' "
               "(FORMAT PARQUET)")


def fixture(root, tag, oracle, names, results):
    out = os.path.join(root, tag)
    os.makedirs(out)
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump(oracle, f)
    with open(os.path.join(out, "names.json"), "w") as f:
        json.dump(names, f)
    for r in results:
        write_result(out, r)
    return out


def main():
    root = tempfile.mkdtemp(prefix="check-selftest-")
    sf = os.path.join(root, "sf")
    os.makedirs(sf)
    failures = []

    def case(title, ok, r):
        print(("ok   " if ok else "FAIL ") + title)
        if not ok:
            failures.append(title)
            print("  stdout: " + r.stdout.strip()[-400:])

    # 1: complete dump (every registered query carries an oracle)
    out = fixture(root, "clean",
                  {"q1": "SELECT 1 AS x", "q2_other": "SELECT 1 AS x"},
                  ["q1", "q2_other"], ["q1", "q2_other"])
    r = run_check(sf, out)
    case("clean dump passes", r.returncode == 0, r)

    # 2: an ORACLE query that threw (no result dir) fails by name
    out = fixture(root, "miss_oracle",
                  {"q1": "SELECT 1 AS x", "q2_other": "SELECT 1 AS x"},
                  ["q1", "q2_other"], ["q2_other"])
    r = run_check(sf, out)
    case("missing oracle-query result fails",
         r.returncode != 0 and "q1" in r.stdout, r)

    # 3: the rows-only carve-out is RETIRED (round 16) — a registered
    # query with a result but NO oracle entry is itself a failure, not
    # a weaker rows>0 check
    out = fixture(root, "no_oracle_entry", {"q1": "SELECT 1 AS x"},
                  ["q1", "q2_rows_only"], ["q1", "q2_rows_only"])
    r = run_check(sf, out)
    case("registered query without oracle entry fails",
         r.returncode != 0 and "q2_rows_only" in r.stdout, r)

    # 4: a stale oracle key (query renamed, oracle not) fails loudly
    out = fixture(root, "stale", {"q_old_name": "SELECT 1 AS x"},
                  ["q_new_name"], ["q_new_name"])
    r = run_check(sf, out)
    case("stale oracle key fails",
         r.returncode != 0 and "q_old_name" in r.stdout, r)

    # 5: a NEW gap in the registered qNN sequence fails by number — a
    # dropped registration must not vanish the way q39's history did
    out = fixture(root, "gap", {"q1": "SELECT 1 AS x"},
                  ["q1", "q3_survivor"], ["q1", "q3_survivor"])
    r = run_check(sf, out)
    case("registry number gap fails",
         r.returncode != 0 and "q02" in r.stdout, r)

    # 7: TYPE parity — an oracle whose sum() silently widened to
    # HUGEINT must fail even though every VALUE matches (round 14's
    # q123: driver hash red on int128-vs-int64 with equal values; the
    # value-comparing gate alone was blind to it)
    out = fixture(
        root, "type_drift",
        {"q1": "SELECT sum(x) AS x FROM (VALUES (CAST(1 AS BIGINT))) t(x)"},
        ["q1"], [])
    write_result(out, "q1", "SELECT CAST(1 AS BIGINT) AS x")
    r = run_check(sf, out)
    case("uncast-sum type drift fails on type, not value",
         r.returncode != 0 and "TYPES differ" in r.stdout
         and "HUGEINT" in r.stdout, r)

    # 8: timestamp FLAVOR divergence fails loudly — the round-15
    # collapse was dropped (no flavor pair exists in the real gate and
    # the driver hasher's flavor behavior is unverifiable from here);
    # the fix when one appears is an ORACLE-side cast, the q123
    # HUGEINT precedent
    # (the flavor sits on the ORACLE side: a result-side flavor would
    # be normalized by the parquet write/read round-trip, oracle types
    # come straight off the relation)
    out = fixture(
        root, "ts_flavors",
        {"q1": "SELECT CAST(TIMESTAMP '2024-01-01 00:00:00' "
               "AS TIMESTAMP_NS) AS ts"},
        ["q1"], [])
    write_result(out, "q1",
                 "SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts")
    r = run_check(sf, out)
    case("timestamp flavor divergence fails on type",
         r.returncode != 0 and "TYPES differ" in r.stdout, r)

    # 9: NESTED type drift — a widened leaf INSIDE a struct must fail
    # on type exactly like a top-level one (verbatim type strings
    # cover composite types; round-15 verdict item 7)
    out = fixture(
        root, "nested_type_drift",
        {"q1": "SELECT {'a': sum(x), 'b': 1} AS s "
               "FROM (VALUES (CAST(1 AS BIGINT))) t(x)"},
        ["q1"], [])
    write_result(out, "q1",
                 "SELECT {'a': CAST(1 AS BIGINT), 'b': 1} AS s")
    r = run_check(sf, out)
    case("nested struct-leaf type drift fails on type, not value",
         r.returncode != 0 and "TYPES differ" in r.stdout
         and "HUGEINT" in r.stdout, r)

    # 10: identical nested types stay a non-failure (no false positive
    # from the verbatim composite compare)
    out = fixture(
        root, "nested_clean",
        {"q1": "SELECT [CAST(1 AS BIGINT)] AS l, "
               "{'a': CAST(2 AS BIGINT)} AS s"},
        ["q1"], [])
    write_result(out, "q1",
                 "SELECT [CAST(1 AS BIGINT)] AS l, "
                 "{'a': CAST(2 AS BIGINT)} AS s")
    r = run_check(sf, out)
    case("identical nested types pass", r.returncode == 0, r)

    # 11: a deliberate NO_ORACLE_ALLOWLIST entry downgrades to rows>0
    # (and still fails on an empty result) — the enforcement branch
    # the round-16 verdict asked for, exercised in-process because the
    # allowlist is deliberately empty in the shipped gate
    sys.path.insert(0, HERE)
    import check as check_mod
    check_mod._BUDGET_ENV = None

    def run_inproc(out):
        try:
            check_mod.main(sf, out)
            return 0
        except SystemExit as e:
            return e.code or 0
    out = fixture(root, "allowlisted", {"q1": "SELECT 1 AS x"},
                  ["q1", "q2_no_sql"], ["q1", "q2_no_sql"])
    saved = dict(check_mod.NO_ORACLE_ALLOWLIST)
    try:
        check_mod.NO_ORACLE_ALLOWLIST["q2_no_sql"] = "selftest fixture"
        case("allowlisted oracle-less query passes on rows>0",
             run_inproc(out) == 0,
             subprocess.CompletedProcess([], 0, stdout="", stderr=""))
        out = fixture(root, "allowlisted_empty", {"q1": "SELECT 1 AS x"},
                      ["q1", "q2_no_sql"], ["q1"])
        write_result(out, "q2_no_sql", "SELECT 1 AS x WHERE 1=0")
        case("allowlisted query with 0 rows still fails",
             run_inproc(out) != 0,
             subprocess.CompletedProcess([], 0, stdout="", stderr=""))
    finally:
        check_mod.NO_ORACLE_ALLOWLIST.clear()
        check_mod.NO_ORACLE_ALLOWLIST.update(saved)

    # 12: budget_for grants the 10x budget ONLY to the canonical
    # /root/testdata/sf0.1 (realpath equality — round-16 ADVICE: a
    # suffix match let any .../testdata/sf0.1 copy inherit it); a
    # symlink TO the canonical dir still qualifies
    impostor = os.path.join(root, "testdata", "sf0.1")
    os.makedirs(impostor)
    case("budget_for: non-canonical testdata/sf0.1 copy gets 30s",
         check_mod.budget_for(impostor) == 30.0,
         subprocess.CompletedProcess([], 0, stdout="", stderr=""))
    link = os.path.join(root, "sf01-link")
    os.symlink("/root/testdata/sf0.1", link)
    case("budget_for: symlink to the canonical sf0.1 gets 300s",
         check_mod.budget_for(link) == 300.0,
         subprocess.CompletedProcess([], 0, stdout="", stderr=""))

    # 6: the q39 tombstone itself stays allowed (no false positive)
    out = fixture(root, "tombstone",
                  {"q38": "SELECT 1 AS x", "q40": "SELECT 1 AS x"},
                  ["q38", "q40"], ["q38", "q40"])
    r = run_check(sf, out)
    case("known tombstone q39 does not fail", r.returncode == 0, r)

    shutil.rmtree(root)
    if failures:
        print(f"\n{len(failures)} SELFTEST FAILURES: {failures}")
        sys.exit(1)
    print("\nALL CHECK.PY GUARDS HOLD")


if __name__ == "__main__":
    main()
