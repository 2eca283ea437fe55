#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by
graft.Verify), runs the matching SQL from oracle_sql.json in DuckDB over
views named after the testdata tables, and compares row-by-row with
columns sorted by name. Exits non-zero when any query mismatches.

Also times each oracle replay and writes the table to
<verifyOutDir>/oracle_timings.json. The round-13 driver gate recorded
`{}` because the full replay had grown past the driver's compare
budget (~14 min of DuckDB wall); the replay cost is now a GUARDED
number — any single oracle over budget_for(sfDir) seconds is a
failure, so a regression shows up here before it silently starves
the driver's gate.
"""
import duckdb, glob, json, math, os, re, sys, time

# Registry numbers allowed to be absent: q39 was retired in round 12
# (its semantics were folded into q45/q58's recall twins) and is
# tombstoned in queries/Pipeline.scala. Grow this set ONLY together
# with a tombstone comment in the registry — the gap guard below
# exists because q39's history had to be re-derived after it vanished
# silently.
#
# Rows-only queries no longer exist (round 15 retired the last two,
# q26/q33, with real oracles) and the carve-out is GONE: a registered
# query with no oracle entry is now a gate FAILURE, not a weaker
# rows>0 check — dead carve-out code in the gate is surface area for
# the next silent divergence (round-16 verdict item). A genuinely
# SQL-inexpressible future operator gets a deliberate
# NO_ORACLE_ALLOWLIST entry below, with the rationale in its registry
# comment.
TOMBSTONES = {39}

# Registered queries deliberately gated WITHOUT a DuckDB oracle
# (name -> one-line rationale). Empty by design: every current query
# replays in SQL, and history says new ones can too (rounds 2-15
# retired every "SQL-inexpressible" claim with an exact integer-form
# oracle). An entry here is a last resort that weakens the gate to a
# rows>0 check for that one name — it must carry its rationale here
# AND in the registry comment, and the enforcement branch below is
# what makes the promise real (the round-16 verdict flagged the
# comment-without-structure form).
NO_ORACLE_ALLOWLIST = {}

# Per-oracle replay budget (seconds, sf0.01 — the DRIVER's gate
# scale). Post-round-14 rewrite the slowest oracle is ~5 s; 30 s of
# headroom flags only real regressions (a lambda-form dot product, an
# inlined CTE chain gone exponential). A local sf0.1 replay
# legitimately runs the recursive-CC oracles (q46/q96) 40–50 s at 10×
# data, so the default budget scales 10× when the sf dir is the
# testdata sf0.1 layout (any OTHER big dataset — a copy, a ScaleGen
# dir — needs the explicit override): the guard is about the driver
# gate starving, not about local 10× runs. GRAFT_ORACLE_BUDGET_S, when
# set, is the budget VERBATIM — no scaling on top.
_BUDGET_ENV = os.environ.get("GRAFT_ORACLE_BUDGET_S")

def budget_for(sf_dir):
    if _BUDGET_ENV is not None:
        return float(_BUDGET_ENV)
    # the 10x budget is for the CANONICAL sf0.1 testdata layout only —
    # a copy or ScaleGen dir that happens to end in "sf0.1" must not
    # silently inherit it (round-15 ADVICE); any other big dataset
    # sets GRAFT_ORACLE_BUDGET_S explicitly. realpath EQUALITY against
    # the pinned canonical path (round-16 ADVICE: the previous suffix
    # match let any /foo/testdata/sf0.1 copy qualify, contradicting
    # this comment); realpath on the candidate so relative spellings
    # and symlinks of the canonical dir still resolve to it.
    return 30.0 * (10 if os.path.realpath(sf_dir)
                   == "/root/testdata/sf0.1" else 1)

def norm_type(t):
    """Type-parity normalization: VERBATIM, including nested types.

    The round-14 driver gate failed q123 on BIGINT-vs-HUGEINT with
    EQUAL values — the driver's hasher is type-sensitive, so this
    guard compares per-column DuckDB type strings directly. Verbatim
    means nested types (STRUCT/LIST leaves) are covered for free: a
    HUGEINT leaf inside a struct differs as a substring of the type
    string (selftest-pinned).

    A timestamp-flavor collapse (TIMESTAMP_NS -> TIMESTAMP) lived here
    in round 15; it was DROPPED (round-15 ADVICE): no flavor
    divergence exists anywhere in the current gate (all 6 timestamp
    columns are TIMESTAMP on both sides), and whether the driver's
    hasher normalizes flavors is unverifiable from here — if a flavor
    divergence ever appears, fail loudly and cast on the ORACLE side,
    the q123 HUGEINT precedent. (A house-type allowlist was considered
    and rejected: INTEGER is legitimately emitted on BOTH sides by 39
    oracle columns — direct parity is stronger, no false positives.)
    """
    return str(t)

def norm(v):
    if isinstance(v, float):
        return v  # compare exactly; report near-misses separately
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    result_dirs = sorted(
        d for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d))
    failures = []
    timings = {}
    # a query that THREW inside Verify writes no result dir at all —
    # comparing only present dirs silently shrank the gate (q41/q48
    # vanished this way when the testdata's timestamp type changed);
    # every registered query must produce a result. The expectation
    # comes from names.json (the FULL registered list Verify emits),
    # not from oracle keys: names.json is what Verify actually RAN,
    # so a registration whose oracle entry was dropped alongside it
    # still shows up as missing here rather than vanishing from both
    # maps at once.
    present = {os.path.basename(d) for d in result_dirs}
    names_path = os.path.join(out_dir, "names.json")
    if os.path.exists(names_path):
        with open(names_path) as f:
            registered = set(json.load(f))
    else:  # older dump without names.json: fall back to oracle keys
        registered = set(oracle)
    # converse guard: an oracle key with no registered query behind it
    # (a renamed query leaving a stale oracle) would silently drop out
    # of the gate — its SQL runs against nothing and nothing compares
    stale = sorted(set(oracle) - registered)
    for name in stale:
        failures.append(name)
        print(f"FAIL {name}: oracle entry has no registered query "
              "(renamed without updating the oracle key?)")
    # tombstone guard: the registered qNN sequence must stay gap-free
    # except for the known TOMBSTONES — a dropped registration would
    # otherwise vanish from the gate without a trace. Runs on the FULL
    # names.json list, so VERIFY_ONLY narrowing cannot mask a gap.
    nums = sorted(int(m.group(1)) for n in registered
                  for m in [re.match(r"q(\d+)(_|$)", n)] if m)
    if nums:
        expect = set(range(min(nums), max(nums) + 1)) - TOMBSTONES
        for g in sorted(expect - set(nums)):
            failures.append(f"q{g:02d}")
            print(f"FAIL q{g:02d}: registry gap — query number missing "
                  "and not a known tombstone (a registration was "
                  "dropped, or TOMBSTONES needs a deliberate entry)")
    # honor the same narrowing Verify honors, else a filtered local
    # run would flag every skipped query as missing
    only = [s for s in os.environ.get("SPARK_GRAFT_VERIFY_ONLY", "")
            .split(",") if s]
    expected = {n for n in registered
                if not only or any(s in n for s in only)}
    missing = sorted(expected - present)
    for name in missing:
        failures.append(name)
        print(f"FAIL {name}: no result written (query threw in Verify?)")
    for d in result_dirs:
        name = os.path.basename(d)
        try:
            got = con.sql(
                f"SELECT * FROM '{d}/*.parquet'").fetchall()
            got_desc = con.sql(
                f"DESCRIBE SELECT * FROM '{d}/*.parquet'").fetchall()
            got_cols = [x[0] for x in got_desc]
            got_types = {x[0]: norm_type(x[1]) for x in got_desc}
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: cannot read spark result: {e}")
            continue
        if name not in oracle:
            if name in NO_ORACLE_ALLOWLIST:
                # the deliberate carve-out: rows>0 is all we can check
                n = con.sql(
                    f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                if n > 0:
                    print(f"PASS {name}: {n} rows (NO-ORACLE allowlist: "
                          f"{NO_ORACLE_ALLOWLIST[name]})")
                else:
                    failures.append(name)
                    print(f"FAIL {name}: allowlisted rows-only query "
                          "returned 0 rows")
                continue
            # the rows-only carve-out is retired (see TOMBSTONES note):
            # every registered query must carry a full oracle
            failures.append(name)
            print(f"FAIL {name}: registered query has NO oracle entry "
                  "(rows-only gating was retired in round 16 — add an "
                  "oracleSql entry or a deliberate NO_ORACLE_ALLOWLIST "
                  "row)")
            continue
        t0 = time.time()
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = [c for c in exp_rel.columns]
            exp = exp_rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            continue
        timings[name] = round(time.time() - t0, 3)
        if timings[name] > budget_for(sf_dir):
            failures.append(name)
            print(f"FAIL {name}: oracle replay {timings[name]:.1f}s exceeds "
                  f"the {budget_for(sf_dir):.0f}s budget — the driver gate "
                  "starves on slow oracles before anything else breaks")
            continue
        # sort columns by name on both sides (driver convention)
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        if sorted(got_cols) != sorted(exp_cols):
            failures.append(name)
            print(f"FAIL {name}: column sets differ: spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            continue
        # type-parity guard (round 15): the driver's hasher is
        # type-sensitive and the value comparison below is not — an
        # oracle whose sum() widened to HUGEINT passes here on values
        # and fails the driver on type (round 14's only red row)
        exp_types = {c: norm_type(t)
                     for c, t in zip(exp_cols, exp_rel.types)}
        tdiff = [(c, got_types[c], exp_types[c])
                 for c in sorted(got_cols) if got_types[c] != exp_types[c]]
        if tdiff:
            failures.append(name)
            print(f"FAIL {name}: column TYPES differ (the driver's hash "
                  "is type-sensitive even when values match): "
                  + ", ".join(f"{c} spark={a} oracle={b}"
                              for c, a, b in tdiff))
            continue
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        e = [tuple(norm(r[i]) for i in ei) for r in exp]
        if len(g) != len(e):
            failures.append(name)
            print(f"FAIL {name}: row count {len(g)} vs oracle {len(e)}")
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first: ")
            for i, a, b in bad[:3]:
                print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
        else:
            print(f"PASS {name}: {len(g)} rows ({timings[name]:.2f}s)")
    with open(os.path.join(out_dir, "oracle_timings.json"), "w") as f:
        json.dump(dict(sorted(timings.items(), key=lambda x: -x[1])), f,
                  indent=1)
    if timings:
        top = sorted(timings.items(), key=lambda x: -x[1])[:5]
        print(f"\noracle replay wall: {sum(timings.values()):.1f}s over "
              f"{len(timings)}; slowest: "
              + ", ".join(f"{n} {t:.1f}s" for n, t in top))
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print(f"\nALL {len(result_dirs)} QUERIES PASS")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
