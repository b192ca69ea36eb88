"""StreamingUpsertPublisher: LWW fold == batch arg-max, any batching."""

import datetime as dt

from polars_grouper_spark.streaming.publish import StreamingUpsertPublisher


def _rows():
    t = dt.datetime(2024, 1, 1)
    return [
        # key, ts, id, v
        (1, t + dt.timedelta(minutes=5), 10, "a"),
        (1, t + dt.timedelta(minutes=9), 11, "b"),   # newest for key 1
        (2, t + dt.timedelta(minutes=1), 20, "c"),
        (2, t + dt.timedelta(minutes=1), 21, "d"),   # ts tie -> higher id
        (3, t, 30, "e"),
    ]


def _brute_lww(rows):
    best = {}
    for k, ts, i, v in rows:
        if k not in best or (ts, i) > (best[k][0], best[k][1]):
            best[k] = (ts, i, v)
    return {k: (ts, i, v) for k, (ts, i, v) in best.items()}


def _feed(spark, pub, batches):
    for j, batch in enumerate(batches):
        df = spark.createDataFrame(
            batch, "k long, ts timestamp, id long, v string"
        )
        pub.update(df, j)


def test_lww_fold_matches_batch_argmax_any_batching(spark):
    rows = _rows()
    want = _brute_lww(rows)
    for batching in ([rows], [rows[:2], rows[2:]], [[r] for r in rows]):
        pub = StreamingUpsertPublisher("k", "ts", "id", ["v"])
        _feed(spark, pub, batching)
        got = {
            r["key"]: (r["ts"], r["id"], r["v"]) for r in pub.table().collect()
        }
        assert got == want, batching


def test_lww_redelivery_is_idempotent(spark):
    rows = _rows()
    pub = StreamingUpsertPublisher("k", "ts", "id", ["v"])
    _feed(spark, pub, [rows, rows, rows[:3]])  # re-deliveries
    assert {
        r["key"]: (r["ts"], r["id"], r["v"]) for r in pub.table().collect()
    } == _brute_lww(rows)
    assert pub.batches == 3
