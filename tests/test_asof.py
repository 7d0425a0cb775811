"""As-of join tests: equivalence with a naive argmax-per-left-row
computation, strict vs inclusive semantics, tolerance, and the single-
shuffle plan property."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_optimizations_spark.operators.asof import asof_join
from delta_lake_optimizations_spark.plans.inspect import plan_summary


def _frames(spark):
    base = dt.datetime(2024, 1, 1)
    trades = [
        ("A", base + dt.timedelta(minutes=m), f"t{m}") for m in (5, 10, 15, 40)
    ] + [("B", base + dt.timedelta(minutes=m), f"t{m}") for m in (3, 30)]
    quotes = [
        ("A", base + dt.timedelta(minutes=m), 100.0 + m) for m in (0, 5, 12, 35)
    ] + [("B", base + dt.timedelta(minutes=m), 200.0 + m) for m in (10,)]
    tdf = spark.createDataFrame(
        trades,
        T.StructType([
            T.StructField("sym", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("trade_id", T.StringType()),
        ]),
    )
    qdf = spark.createDataFrame(
        quotes,
        T.StructType([
            T.StructField("sym", T.StringType()),
            T.StructField("qts", T.TimestampType()),
            T.StructField("price", T.DoubleType()),
        ]),
    )
    return tdf, qdf


def _naive(trades, quotes, strict):
    out = {}
    for t in trades:
        best = None
        for q in quotes:
            if q[0] != t[0]:
                continue
            ok = q[1] < t[1] if strict else q[1] <= t[1]
            if ok and (best is None or q[1] > best[1]):
                best = q
        out[t[2]] = best[2] if best else None
    return out


def test_asof_inclusive_matches_naive(spark):
    tdf, qdf = _frames(spark)
    trades = [(r["sym"], r["ts"], r["trade_id"]) for r in tdf.collect()]
    quotes = [(r["sym"], r["qts"], r["price"]) for r in qdf.collect()]
    got = {
        r["trade_id"]: r["price_asof"]
        for r in asof_join(tdf, qdf, "sym", "ts", "qts").collect()
    }
    assert got == _naive(trades, quotes, strict=False)


def test_asof_strict_excludes_equal_timestamp(spark):
    tdf, qdf = _frames(spark)
    trades = [(r["sym"], r["ts"], r["trade_id"]) for r in tdf.collect()]
    quotes = [(r["sym"], r["qts"], r["price"]) for r in qdf.collect()]
    got = {
        r["trade_id"]: r["price_asof"]
        for r in asof_join(tdf, qdf, "sym", "ts", "qts", strict=True).collect()
    }
    want = _naive(trades, quotes, strict=True)
    assert got == want
    # the minute-5 trade has a minute-5 quote: inclusive finds it, strict
    # falls back to the minute-0 quote
    assert got["t5"] == 100.0


def test_asof_tolerance_nulls_stale_matches(spark):
    tdf, qdf = _frames(spark)
    got = {
        r["trade_id"]: r["price_asof"]
        for r in asof_join(
            tdf, qdf, "sym", "ts", "qts", tolerance_seconds=300
        ).collect()
    }
    assert got["t40"] == 135.0  # quote at minute 35, 5 min old: within tolerance
    assert got["t30"] is None  # B quote at minute 10 is 20 min stale
    assert got["t15"] == 112.0  # A quote at minute 12 is 3 min old: kept


def test_asof_single_shuffle(spark):
    tdf, qdf = _frames(spark)
    s = plan_summary(asof_join(tdf, qdf, "sym", "ts", "qts"))
    # one hash-partitioning exchange per input side feeding ONE window —
    # never a per-row range join or broadcast nested loop
    assert s["sort_merge_joins"] + s["broadcast_hash_joins"] + s["shuffled_hash_joins"] == 0


def _naive_directional(trades, quotes, direction, strict=False):
    out = {}
    for t in trades:
        cands = []
        for q in quotes:
            if q[0] != t[0]:
                continue
            if direction == "forward":
                ok = q[1] > t[1] if strict else q[1] >= t[1]
                if ok:
                    cands.append((q[1] - t[1], q))
            else:  # nearest
                gap = abs((q[1] - t[1]).total_seconds())
                if strict and q[1] == t[1]:
                    continue
                # ties prefer backward (q before t)
                cands.append(((gap, 0 if q[1] <= t[1] else 1), q))
        best = min(cands)[1] if cands else None
        out[t[2]] = best[2] if best else None
    return out


def test_asof_forward_matches_naive(spark):
    tdf, qdf = _frames(spark)
    trades = [(r["sym"], r["ts"], r["trade_id"]) for r in tdf.collect()]
    quotes = [(r["sym"], r["qts"], r["price"]) for r in qdf.collect()]
    got = {
        r["trade_id"]: r["price_asof"]
        for r in asof_join(
            tdf, qdf, on="sym", left_time="ts", right_time="qts",
            direction="forward",
        ).collect()
    }
    assert got == _naive_directional(trades, quotes, "forward")


def test_asof_nearest_matches_naive_with_backward_ties(spark):
    tdf, qdf = _frames(spark)
    trades = [(r["sym"], r["ts"], r["trade_id"]) for r in tdf.collect()]
    quotes = [(r["sym"], r["qts"], r["price"]) for r in qdf.collect()]
    got = {
        r["trade_id"]: r["price_asof"]
        for r in asof_join(
            tdf, qdf, on="sym", left_time="ts", right_time="qts",
            direction="nearest",
        ).collect()
    }
    assert got == _naive_directional(trades, quotes, "nearest")


def test_asof_nearest_tolerance(spark):
    tdf, qdf = _frames(spark)
    got = {
        r["trade_id"]: r["price_asof"]
        for r in asof_join(
            tdf, qdf, on="sym", left_time="ts", right_time="qts",
            direction="nearest", tolerance_seconds=120.0,
        ).collect()
    }
    # B trades: quote at minute 10 only; t3 is 7 min away -> nulled,
    # t30 is 20 min away -> nulled; A t5/t10 exact/2min -> kept
    assert got["t3"] is None and got["t30"] is None
    assert got["t5"] == 105.0 and got["t10"] == 112.0
