"""Funnel and cohort-retention operators — known-answer fixtures, strict
ordering semantics, DuckDB parity."""

import datetime as dt

import duckdb

from polars_grouper_spark.operators.funnel import (
    cohort_retention,
    cohort_retention_sql,
    funnel_counts,
    funnel_counts_sql,
)


def ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def make_events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_funnel_ordering_is_strict(spark):
    """User 1 completes A->B; user 2 has B before A (not credited); user 3
    has A and B at the SAME timestamp (B not credited: strict >)."""
    ev = make_events(spark, [
        (1, ts(1), "A"), (1, ts(2), "B"),
        (2, ts(2), "B"), (2, ts(3), "A"),
        (3, ts(1), "A"), (3, ts(1), "B"),
    ])
    got = rows(funnel_counts(ev, ["A", "B"]))
    assert got == [(1, "A", 3), (2, "B", 1)]


def test_funnel_greedy_earliest_completion(spark):
    """Earliest A at day 1 admits the B at day 2 even though a later A
    (day 3) also exists."""
    ev = make_events(spark, [
        (1, ts(1), "A"), (1, ts(3), "A"), (1, ts(2), "B"),
    ])
    assert rows(funnel_counts(ev, ["A", "B"])) == [(1, "A", 1), (2, "B", 1)]


def test_funnel_unreached_steps_zero(spark):
    ev = make_events(spark, [(1, ts(1), "A")])
    got = rows(funnel_counts(ev, ["A", "B", "C"]))
    assert got == [(1, "A", 1), (2, "B", 0), (3, "C", 0)]


def test_funnel_duckdb_parity(spark):
    evs = []
    for u in range(12):
        evs.append((u, ts(1 + u % 3, u % 5), "signup"))
        if u % 2 == 0:
            evs.append((u, ts(2 + u % 3, u % 7), "view"))
        if u % 3 == 0:
            evs.append((u, ts(3 + u % 4), "purchase"))
    ev = make_events(spark, evs)
    got = rows(funnel_counts(ev, ["signup", "view", "purchase"]))
    con = duckdb.connect()
    vals = ",".join(f"({u}, TIMESTAMP '{t}', '{e}')" for u, t, e in evs)
    con.sql(f"CREATE VIEW events AS SELECT * FROM (VALUES {vals}) t(user_id, ts, event_type)")
    want = sorted(tuple(r) for r in con.sql(
        funnel_counts_sql(["signup", "view", "purchase"])).fetchall())
    assert got == want


def test_retention_offsets(spark):
    """User active in weeks w, w+1, w+3 -> offsets 0, 1, 3 for one cohort."""
    base = dt.datetime(2024, 1, 1)
    wk = dt.timedelta(weeks=1)
    ev = make_events(spark, [
        (1, base, "x"), (1, base + wk, "x"), (1, base + 3 * wk, "x"),
        (2, base, "x"),
    ])
    got = rows(cohort_retention(ev, period="week"))
    cohort = got[0][0]
    assert [(o, n) for c, o, n in got] == [(0, 2), (1, 1), (3, 1)]
    assert all(c == cohort for c, _, _ in got)


def test_retention_multiple_cohorts_and_cap(spark):
    base = dt.datetime(2024, 1, 1)
    wk = dt.timedelta(weeks=1)
    ev = make_events(spark, [
        (1, base, "x"), (1, base + 5 * wk, "x"),
        (2, base + wk, "x"), (2, base + 2 * wk, "x"),
    ])
    got = rows(cohort_retention(ev, period="week", max_offset=2))
    # user 1's offset-5 activity is capped away; cohorts one week apart.
    c1 = min(c for c, _, _ in got)
    assert [(c - c1, o, n) for c, o, n in got] == [
        (0, 0, 1), (1, 0, 1), (1, 1, 1)
    ]


def test_retention_duckdb_parity(spark):
    base = dt.datetime(2024, 2, 10, 13, 37)
    evs = []
    for u in range(20):
        for k in range(u % 4 + 1):
            evs.append((u, base + dt.timedelta(days=3 * u + 9 * k, hours=u), "e"))
    ev = make_events(spark, evs)
    got = rows(cohort_retention(ev, period="day", max_offset=30))
    con = duckdb.connect()
    vals = ",".join(f"({u}, TIMESTAMP '{t}', '{e}')" for u, t, e in evs)
    con.sql(f"CREATE VIEW events AS SELECT * FROM (VALUES {vals}) t(user_id, ts, event_type)")
    want = sorted(tuple(r) for r in con.sql(
        cohort_retention_sql(period="day", max_offset=30)).fetchall())
    assert got == want


def test_interval_coverage_hand_computed(spark):
    """Union length: [0,10] + [5,15] + [20,25] covers 15 + 5 = 20;
    a duplicate interval and a contained interval add nothing."""
    from polars_grouper_spark.operators.intervals import interval_coverage

    rows = [
        ("u", 0, 10), ("u", 5, 15), ("u", 20, 25),
        ("u", 5, 15), ("u", 6, 9),
        ("v", 100, 100),  # degenerate point: zero length
    ]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = {r["g"]: (r["covered"], r["n_intervals"]) for r in
           interval_coverage(df, "s", "e", "g").collect()}
    assert got == {"u": (20, 5), "v": (0, 1)}


def test_interval_coverage_matches_duckdb(spark):
    import random

    import duckdb

    from polars_grouper_spark.operators.intervals import (
        interval_coverage,
        interval_coverage_sql,
    )

    random.seed(21)
    rows = []
    for g in range(6):
        for _ in range(40):
            s = random.randint(0, 1000)
            rows.append((f"g{g}", s, s + random.randint(0, 80)))
    df = spark.createDataFrame(rows, "grp string, s long, e long")
    got = sorted(map(tuple, interval_coverage(df, "s", "e", "grp").collect()))
    vals = ", ".join(f"('{g}',{s},{e})" for g, s, e in rows)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            interval_coverage_sql(
                f"SELECT * FROM (VALUES {vals}) t(grp, s, e)", "grp"
            )
        ).fetchall()
    )
    assert got == want
