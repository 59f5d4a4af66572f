"""Property test: the stateful streaming sessionizer equals a pure-Python
session oracle on arbitrary in-order event streams.

Input events arrive in event-time order (split across micro-batch files at
arbitrary points), so no event is ever late and the emitted-session SET is
a pure function of the data:

- every session CLOSED by a later same-user event (gap exceeded) emits;
- a user's final session emits iff the final watermark (max ts - delay)
  passed its end + gap;
- nothing else emits, and nothing emits twice.
"""

from __future__ import annotations

import datetime
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from biomedica_etl_spark.streaming.stream_runner import stream_sessionize

BASE = datetime.datetime(2025, 1, 1, 10, 0, 0)
GAP_MIN = 30
WM_MIN = 30


def _oracle(events: list[tuple[int, int]]) -> set[tuple[int, int, int, int]]:
    """events: (user, minute). Returns emitted sessions as
    (user, start_min, end_min, n)."""
    if not events:
        return set()
    per_user: dict[int, list[int]] = {}
    for u, m in events:
        per_user.setdefault(u, []).append(m)
    wm = max(m for _, m in events) - WM_MIN
    out = set()
    for u, ms in per_user.items():
        ms.sort()
        sessions = []
        start = last = ms[0]
        n = 1
        for m in ms[1:]:
            if m - last > GAP_MIN:
                sessions.append((start, last, n))
                start, n = m, 0
            last = m
            n += 1
        sessions.append((start, last, n))
        for i, (s, e, k) in enumerate(sessions):
            final = i == len(sessions) - 1
            if not final or e + GAP_MIN <= wm:
                out.add((u, s, e, k))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 400)),
        min_size=1, max_size=40, unique=True,
    ),
    split_frac=st.floats(0.2, 0.8),
)
def test_sessionize_matches_python_oracle(spark, tmp_path_factory, events,
                                          split_frac):
    tmp = tmp_path_factory.mktemp("sess-prop")
    src = tmp / "src"
    src.mkdir()
    # event-time order, split into two micro-batch files at an arbitrary
    # point (in-order arrival: the emitted set must not depend on the cut)
    ordered = sorted(events, key=lambda e: (e[1], e[0]))
    cut = max(1, int(len(ordered) * split_frac))
    for idx, chunk in enumerate([ordered[:cut], ordered[cut:]]):
        if not chunk:
            continue
        t = pa.table({
            "event_id": pa.array(range(len(chunk)), pa.int64()),
            "ts": pa.array(
                [BASE + datetime.timedelta(minutes=m) for _, m in chunk],
                pa.timestamp("us")),
            "user_id": pa.array([u for u, _ in chunk], pa.int64()),
            "value": pa.array([1.0] * len(chunk), pa.float64()),
        })
        p = str(src / f"{idx}.parquet")
        pq.write_table(t, p)
        mt = time.time() - 60 + idx
        os.utime(p, (mt, mt))

    name = f"sess_prop_{abs(hash((tuple(ordered), cut))) % 10**9}"
    q = stream_sessionize(spark, str(src), str(tmp / "ckpt"),
                          query_name=name, gap_minutes=GAP_MIN)
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {
        (r["user_id"],
         int((r["session_start"] - BASE).total_seconds() // 60),
         int((r["session_end"] - BASE).total_seconds() // 60),
         r["n_events"])
        for r in rows
    }
    assert len(got) == len(rows), "a session emitted twice"
    assert got == _oracle(ordered)
