"""Temporal join operators (ops/temporal.py): as-of join and range join.

Correctness is locked against exhaustive pure-Python twins on randomized
inputs with deliberate timestamp collisions (the tie-break paths), and the
plan shapes are locked: asof_join pays exactly ONE exchange (the keyed
window), range_join never degenerates to a broadcast-nested-loop or
cartesian plan.
"""

import contextlib
import io
import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from cypher_guard_spark.ops import temporal


def _t(s: float) -> datetime:
    return datetime(2024, 1, 1) + timedelta(seconds=s)


def _plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def _mk_inputs(seed: int, n_left: int = 60, n_right: int = 60, ts_range: int = 30):
    """Small key space + small integer timestamp range so same-instant ties
    (the interesting path) occur often."""
    rng = random.Random(seed)
    left = [(i, rng.randint(1, 5), _t(rng.randint(0, ts_range))) for i in range(n_left)]
    right = [
        (rng.randint(1, 6), _t(rng.randint(0, ts_range)), 1000 + j)
        for j in range(n_right)
    ]
    return left, right


def _brute_asof(left, right, strict, direction, tolerance_s=None):
    """Exhaustive twin: per left row, best right row by (ts, rid) order."""
    out = {}
    for lid, key, lts in left:
        cands = []
        for rkey, rts, rid in right:
            if rkey != key:
                continue
            if direction == "backward":
                ok = (rts < lts) if strict else (rts <= lts)
            else:
                ok = (rts > lts) if strict else (rts >= lts)
            if ok:
                cands.append((rts, rid))
        best = (max(cands) if direction == "backward" else min(cands)) if cands else None
        if best is not None and tolerance_s is not None:
            if abs((lts - best[0]).total_seconds()) > tolerance_s:
                best = None
        out[lid] = best
    return out


def _spark_asof(spark, left, right, **kw):
    ldf = spark.createDataFrame(left, "lid int, key int, ts timestamp")
    rdf = spark.createDataFrame(right, "key int, ts timestamp, rid int")
    got = temporal.asof_join(ldf, rdf, on="key", right_cols=["rid"], **kw).collect()
    return {
        r["lid"]: (None if r["asof_ts"] is None else (r["asof_ts"], r["asof_rid"]))
        for r in got
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [True, False])
def test_asof_join_matches_bruteforce(spark, direction, strict):
    left, right = _mk_inputs(seed=7 if strict else 11)
    want = _brute_asof(left, right, strict, direction)
    got = _spark_asof(spark, left, right, strict=strict, direction=direction)
    assert got == want


def test_asof_join_tolerance_nulls_far_matches(spark):
    left, right = _mk_inputs(seed=3, ts_range=100)
    want = _brute_asof(left, right, True, "backward", tolerance_s=10)
    got = _spark_asof(spark, left, right, strict=True, direction="backward", tolerance_s=10)
    assert got == want
    # the tolerance must actually bite somewhere on this input
    unbounded = _brute_asof(left, right, True, "backward")
    assert sum(v is None for v in want.values()) > sum(
        v is None for v in unbounded.values()
    )


def test_asof_join_keeps_unmatched_left_and_all_left_columns(spark):
    ldf = spark.createDataFrame(
        [(1, 10, _t(5), "a"), (2, 10, _t(0), "b"), (3, 99, _t(5), "c")],
        "lid int, key int, ts timestamp, tag string",
    )
    rdf = spark.createDataFrame([(10, _t(1), 7)], "key int, ts timestamp, rid int")
    out = temporal.asof_join(ldf, rdf, on="key", right_cols=["rid"])
    rows = {r["lid"]: r for r in out.collect()}
    assert out.columns == ["lid", "key", "ts", "tag", "asof_ts", "asof_rid"]
    assert len(rows) == 3  # left join semantics: every left row survives
    assert rows[1]["asof_rid"] == 7 and rows[1]["tag"] == "a"
    assert rows[2]["asof_rid"] is None  # nothing strictly earlier
    assert rows[3]["asof_rid"] is None  # key with no right rows at all


def test_asof_join_single_exchange(spark):
    left, right = _mk_inputs(seed=1)
    ldf = spark.createDataFrame(left, "lid int, key int, ts timestamp")
    rdf = spark.createDataFrame(right, "key int, ts timestamp, rid int")
    plan = _plan_of(
        temporal.asof_join(ldf, rdf, on="key", right_cols=["rid"]), mode="simple"
    )
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1, plan
    assert "Join" not in plan  # union + window, never a join


def _brute_range(left, right):
    return sorted(
        (lid, rid)
        for lid, lkey, lts in left
        for rid, rkey, lo, hi in right
        if lkey == rkey and lo <= lts < hi
    )


def _mk_intervals(seed: int, n: int = 40, ts_range: int = 600):
    """Interval lengths from zero-length through several-bucket spans."""
    rng = random.Random(seed)
    out = []
    for j in range(n):
        lo = rng.randint(0, ts_range)
        length = rng.choice([0, 1, 30, 60, 61, 200, 400])
        out.append((2000 + j, rng.randint(1, 5), _t(lo), _t(lo + length)))
    return out


def test_range_join_matches_bruteforce(spark):
    rng = random.Random(17)
    left = [(i, rng.randint(1, 5), _t(rng.randint(0, 650))) for i in range(80)]
    right = _mk_intervals(seed=23)
    ldf = spark.createDataFrame(left, "lid int, key int, ts timestamp")
    rdf = spark.createDataFrame(
        right, "rid int, key int, lo timestamp, hi timestamp"
    )
    for bucket_s in (60, 300):  # explode factor varies; result must not
        out = temporal.range_join(
            ldf, rdf, on="key", left_ts="ts", right_lo="lo", right_hi="hi",
            bucket_s=bucket_s,
        )
        got = sorted((r["lid"], r["rid"]) for r in out.collect())
        assert got == _brute_range(left, right), f"bucket_s={bucket_s}"
        # at most one bucket meeting per (left, right) pair — no dup rows
        assert len(got) == len(set(got))


def test_temporal_ops_accept_timestamp_ntz(spark):
    """Parquet timestamps land as TIMESTAMP_NTZ; unix_micros rejects NTZ,
    so both operators must cast internally (regression: first sf0.01 run
    failed analysis with DATATYPE_MISMATCH on the events table)."""
    ldf = spark.createDataFrame(
        [(1, 1, _t(5))], "lid int, key int, ts timestamp"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rdf = spark.createDataFrame(
        [(1, _t(1), 7)], "key int, ts timestamp, rid int"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = temporal.asof_join(
        ldf, rdf, on="key", right_cols=["rid"], tolerance_s=60
    ).collect()
    assert [r["asof_rid"] for r in got] == [7]
    idf = spark.createDataFrame(
        [(9, 1, _t(0), _t(10))], "rid int, key int, lo timestamp, hi timestamp"
    ).select("rid", "key", F.col("lo").cast("timestamp_ntz").alias("lo"),
             F.col("hi").cast("timestamp_ntz").alias("hi"))
    out = temporal.range_join(
        ldf, idf, on="key", left_ts="ts", right_lo="lo", right_hi="hi", bucket_s=60
    ).collect()
    assert [(r["lid"], r["rid"]) for r in out] == [(1, 9)]


def test_range_join_plan_is_equi_join(spark):
    left = [(1, 1, _t(5))]
    right = [(9, 1, _t(0), _t(10))]
    ldf = spark.createDataFrame(left, "lid int, key int, ts timestamp")
    rdf = spark.createDataFrame(right, "rid int, key int, lo timestamp, hi timestamp")
    plan = _plan_of(
        temporal.range_join(
            ldf, rdf, on="key", left_ts="ts", right_lo="lo", right_hi="hi", bucket_s=60
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_range_join_left_keeps_unmatched(spark):
    from pyspark.sql import functions as F

    ldf = spark.createDataFrame(
        [(1, 1, _t(5)), (2, 1, _t(500)), (3, 9, _t(5))],
        "lid int, key int, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(7, 1, _t(0), _t(10))], "rid int, key int, lo timestamp, hi timestamp"
    )
    out = temporal.range_join(
        ldf, rdf, on="key", left_ts="ts", right_lo="lo", right_hi="hi",
        bucket_s=60, how="left",
    )
    rows = {r["lid"]: r["rid"] for r in out.collect()}
    # matched row keeps its interval; out-of-window and foreign-key left
    # rows survive exactly once with a null right side
    assert rows == {1: 7, 2: None, 3: None}
    assert out.count() == 3


def test_asof_join_composite_key(spark):
    left = [(i, i % 2, i % 3, _t(i * 3 + 1)) for i in range(30)]
    right = [(j % 2, j % 3, _t(j * 2), 100 + j) for j in range(40)]
    ldf = spark.createDataFrame(left, "lid int, k1 int, k2 int, ts timestamp")
    rdf = spark.createDataFrame(right, "k1 int, k2 int, ts timestamp, rid int")
    got = {
        r["lid"]: (None if r["asof_ts"] is None else (r["asof_ts"], r["asof_rid"]))
        for r in temporal.asof_join(
            ldf, rdf, on=["k1", "k2"], right_cols=["rid"]
        ).collect()
    }
    want = {}
    for lid, k1, k2, lts in left:
        cands = [
            (rts, rid)
            for rk1, rk2, rts, rid in right
            if (rk1, rk2) == (k1, k2) and rts < lts
        ]
        want[lid] = max(cands) if cands else None
    assert got == want


def test_funnel_matches_bruteforce(spark):
    """Greedy-earliest funnel fold vs an exhaustive twin, including users
    stuck at every depth and gap-budget expiries between stages."""
    rng = random.Random(31)
    types = ["view", "click", "purchase"]
    rows = []
    for i in range(240):
        rows.append(
            (i, rng.randint(1, 12), rng.choice(types), _t(rng.randint(0, 400)))
        )
    ev = spark.createDataFrame(
        rows, "event_id int, user_id int, event_type string, ts timestamp"
    )
    within = 60.0
    got = {
        r["user_id"]: (
            r["completed_step"], r["step_1_ts"], r["step_2_ts"], r["step_3_ts"]
        )
        for r in temporal.funnel(ev, steps=types, within_s=within).collect()
    }
    want = {}
    for uid in {r[1] for r in rows}:
        evs = [(ts, et) for _i, u, et, ts in rows if u == uid]
        s1 = min((ts for ts, et in evs if et == "view"), default=None)
        if s1 is None:
            continue  # no step-1 -> user absent from the funnel
        def nxt(after, et):
            c = [
                ts for ts, t in evs
                if t == et and ts > after
                and (ts - after).total_seconds() <= within
            ]
            return min(c, default=None)
        s2 = nxt(s1, "click")
        s3 = nxt(s2, "purchase") if s2 is not None else None
        depth = 3 if s3 else (2 if s2 else 1)
        want[uid] = (depth, s1, s2, s3)
    assert got == want
    assert {d for d, *_ in want.values()} == {1, 2, 3}  # all depths hit


def test_events_retention_cohort_grid(spark, tmp_path):
    """Cohort/offset grid on crafted events with several cohorts, gaps
    (churn weeks), and returning users — vs an exhaustive twin."""
    from cypher_guard_spark.ops.relational import events_retention

    week = 7 * 86400
    base = datetime(2024, 1, 4)  # epoch-aligned enough; twin uses same rule
    rows, eid = [], 0
    plan = {
        1: [0, 1, 2], 2: [0, 2], 3: [0], 4: [1, 2, 3], 5: [1, 3, 3],
    }
    for uid, weeks in plan.items():
        for wk in weeks:
            rows.append((eid, uid, "view", base + timedelta(seconds=wk * week)))
            eid += 1
    src = tmp_path / "events.parquet"
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    ).write.parquet(str(src))
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in events_retention(spark, str(tmp_path), period_s=week).collect()
    }
    # twin
    from collections import defaultdict

    per_user = defaultdict(set)
    for _e, uid, _t, ts in rows:
        per_user[uid].add(int(ts.timestamp()) // week)
    want = defaultdict(set)
    for uid, ps in per_user.items():
        c = min(ps)
        for p in ps:
            want[(c, p - c)].add(uid)
    assert got == {k: len(v) for k, v in want.items()}
    # offset-0 cell of each cohort counts the whole cohort
    cohorts = defaultdict(set)
    for uid, ps in per_user.items():
        cohorts[min(ps)].add(uid)
    for c, users in cohorts.items():
        assert got[(c, 0)] == len(users)


def test_event_transitions_matches_bruteforce(spark):
    import random
    from collections import Counter, defaultdict

    from cypher_guard_spark.ops.temporal import event_transitions

    rng = random.Random(11)
    rows = [
        (eid, rng.randrange(12), _t(rng.randrange(40)), rng.choice("abcd"))
        for eid in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id int, ts timestamp, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in event_transitions(df).collect()
    }
    seqs = defaultdict(list)
    for eid, uid, ts, et in rows:
        seqs[uid].append((ts, eid, et))
    want: Counter = Counter()
    for evs in seqs.values():
        evs.sort()  # (ts, event_id) — the operator's tie rule
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


def test_event_transitions_singletons_emit_nothing(spark):
    from cypher_guard_spark.ops.temporal import event_transitions

    df = spark.createDataFrame(
        [(1, 1, _t(0), "x"), (2, 2, _t(1), "y")],
        "event_id int, user_id int, ts timestamp, event_type string",
    )
    assert event_transitions(df).count() == 0


def test_rate_anomalies_matches_bruteforce(spark):
    import math
    import random
    from collections import Counter
    from datetime import datetime, timedelta

    from cypher_guard_spark.ops.temporal import rate_anomalies

    rng = random.Random(5)
    base = datetime(2026, 1, 1)
    rows = []
    eid = 0
    # steady traffic + one planted flood hour + one dead type
    for h in range(48):
        for _ in range(8 + rng.randrange(0, 3)):
            rows.append((eid, base + timedelta(hours=h, minutes=rng.randrange(60)), "click"))
            eid += 1
    for _ in range(200):  # flood in hour 10
        rows.append((eid, base + timedelta(hours=10, minutes=rng.randrange(60)), "click"))
        eid += 1
    rows.append((eid, base, "singleton"))  # one bucket only: emits nothing
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = {
        (r["event_type"], r["bucket_ts"], r["n_events"]): r["z"]
        for r in rate_anomalies(df, z_threshold=2.0).collect()
    }
    counts = Counter((et, ts.replace(minute=0, second=0, microsecond=0)) for _e, ts, et in rows)
    per_type = {}
    for (et, b), n in counts.items():
        per_type.setdefault(et, []).append((b, n))
    want = {}
    for et, buckets in per_type.items():
        nb = len(buckets)
        if nb < 2:
            continue
        sx = float(sum(n for _b, n in buckets))
        sxx = float(sum(n * n for _b, n in buckets))
        var = (sxx - sx * sx / nb) / (nb - 1)
        if var <= 0:
            continue
        for b, n in buckets:
            z = (n - sx / nb) / math.sqrt(var)
            if abs(z) >= 2.0:
                want[(et, b, n)] = round(z, 6)
    assert set(got) == set(want)
    for k, z in want.items():
        assert abs(got[k] - z) <= 1e-6, k
    # the planted flood hour is flagged
    assert any(b.hour == 10 and et == "click" for et, b, _n in got)
    assert not any(et == "singleton" for et, _b, _n in got)


# ---------------------------------------------------------------------------
# incremental at-rest rollup maintenance
# ---------------------------------------------------------------------------


def test_rollup_incremental_equals_full_recompute(spark, tmp_path):
    """Folding batches (incl. late data into an existing hour) into the
    at-rest rollup equals a full recompute bit-for-bit (integer-additive
    merge), and untouched day partitions are not rewritten on disk."""
    import datetime as dt
    import os

    from cypher_guard_spark.ops.temporal import (
        hourly_rollup,
        rollup_apply_batch,
        write_rollup,
    )

    schema = "event_id long, ts timestamp, event_type string, value double"
    t0 = dt.datetime(2026, 3, 1, 10, 15)
    day2 = dt.datetime(2026, 3, 2, 9, 5)
    wave1 = [
        (1, t0, "click", 1.5),
        (2, t0 + dt.timedelta(minutes=20), "click", 2.25),
        (3, t0 + dt.timedelta(hours=1), "view", 0.5),
        (4, day2, "click", 3.0),
    ]
    # wave 2: late data into day1's first hour + a brand-new day-3 hour
    wave2 = [
        (5, t0 + dt.timedelta(minutes=40), "click", 10.0),
        (6, dt.datetime(2026, 3, 3, 0, 0), "view", 7.75),
    ]
    path = str(tmp_path / "rollup")
    write_rollup(spark.createDataFrame(wave1, schema), path)
    # day-2 partition files before the batch — must survive untouched
    d2dir = os.path.join(path, "day=2026-03-02")
    before = {f: os.path.getmtime(os.path.join(d2dir, f))
              for f in os.listdir(d2dir) if f.endswith(".parquet")}
    rollup_apply_batch(spark, spark.createDataFrame(wave2, schema), path)
    after = {f: os.path.getmtime(os.path.join(d2dir, f))
             for f in os.listdir(d2dir) if f.endswith(".parquet")}
    assert before == after  # dynamic overwrite never touched day 2

    got = {
        (str(r["day"]), r["hour_start"], r["event_type"]): (r["n"], r["sum_fp"])
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r["day"], r["hour_start"], r["event_type"]): (r["n"], r["sum_fp"])
        for r in hourly_rollup(
            spark.createDataFrame(wave1 + wave2, schema)
        ).collect()
    }
    assert got == want
    # the late click landed additively in the existing 10:00 bucket
    key = ("2026-03-01", dt.datetime(2026, 3, 1, 10, 0), "click")
    assert got[key] == (3, 15000 + 22500 + 100000)


def test_rollup_empty_batch_noop(spark, tmp_path):
    import datetime as dt

    from cypher_guard_spark.ops.temporal import rollup_apply_batch, write_rollup

    schema = "event_id long, ts timestamp, event_type string, value double"
    path = str(tmp_path / "rollup2")
    write_rollup(
        spark.createDataFrame(
            [(1, dt.datetime(2026, 1, 1, 1), "x", 1.0)], schema
        ),
        path,
    )
    before = spark.read.parquet(path).collect()
    rollup_apply_batch(spark, spark.createDataFrame([], schema), path)
    assert spark.read.parquet(path).collect() == before


def test_activity_decay_exact_dyadic(spark):
    """Hand-valued decayed activity: per-event 2^-age weights sum with
    zero rounding (integer bit-shift partial agg + one binary re-scale),
    cutoff beyond cap, ref date = corpus max event date."""
    import datetime as dt

    from cypher_guard_spark.ops.temporal import activity_decay

    t0 = dt.datetime(2026, 3, 31, 12, 0, 0)  # ref date = 2026-03-31

    def ev(uid, days_back, hour=1):
        return (uid, t0 - dt.timedelta(days=days_back, hours=hour))

    rows = [
        ev(1, 0),            # weight 1 (but hour offset crosses a date? no: 12:00-1h = same day)
        ev(1, 1),            # 0.5
        ev(1, 2),            # 0.25
        ev(2, 0), ev(2, 0),  # two same-day events: 2.0
        ev(3, 31),           # beyond cap: 0
        ev(3, 30),           # exactly cap: 2^-30
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["user_id"]: (r["n_events"], r["n_recent"], r["activity"])
        for r in activity_decay(df, cap_days=30).collect()
    }
    assert got[1] == (3, 3, 1.75)
    assert got[2] == (2, 2, 2.0)
    # 2^-30 rounds to 0.0 at 6dp; the cutoff event contributes nothing
    assert got[3] == (2, 1, 0.0)
    # partition invariance (exact integer agg — bit-identical any layout)
    got7 = {
        r["user_id"]: (r["n_events"], r["n_recent"], r["activity"])
        for r in activity_decay(df.repartition(7), cap_days=30).collect()
    }
    assert got7 == got
