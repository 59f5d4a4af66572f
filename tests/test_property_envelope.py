"""Property-based envelope interop: wire-format round-trip + parser fuzz.

Two invariants, searched rather than hand-picked:

1. For arbitrary generator configs (event mix, duplicates, disorder,
   schema epochs), the Debezium-NDJSON transport leg — deterministic
   converter -> JVM parse -> fenced micro-batch apply — converges to the
   SAME final state as the pure-Python replay. The wire format adds no
   semantics and loses none.
2. The parser NEVER raises on arbitrary byte garbage or arbitrarily
   shaped JSON: every input line lands in exactly one bucket — a clean
   event, or a quarantineable event (op/key/lsn null), matching the DLQ
   split's verdict. Poisoned transports degrade, never crash.
"""

from __future__ import annotations

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from biomedica_etl_spark.cdc import envelope as E
from biomedica_etl_spark.cdc.generator import GeneratorConfig, generate_change_log
from biomedica_etl_spark.cdc.oracle import replay

configs = st.fixed_dictionaries(
    {
        "seed": st.integers(0, 2**31 - 1),
        "n_events": st.integers(500, 3_000),
        "n_convs": st.integers(5, 80),
        "update_frac": st.floats(0.0, 0.4),
        "delete_frac": st.floats(0.0, 0.25),
        "duplicate_frac": st.floats(0.0, 0.1),
        "batch_size": st.integers(200, 1_200),
        "zipf_a": st.sampled_from([0.0, 1.2]),
        "out_of_order": st.booleans(),
        "schema_epoch_starts": st.sampled_from(
            [(0.0,), (0.0, 0.5), (0.0, 0.3, 0.6)]),
    }
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cfg=configs)
def test_envelope_transport_equals_replay_for_arbitrary_configs(
        spark, tmp_path_factory, cfg):
    d = tmp_path_factory.mktemp("propdbz")
    log = str(d / "log")
    generate_change_log(log, GeneratorConfig(**cfg))
    ndj = str(d / "ndj")
    E.write_debezium_log(log, ndj)
    table = E.ingest_debezium(spark, ndj, str(d / "t"), n_buckets=4)
    actual = [r.asDict() for r in
              table.read(spark).orderBy("conv_id", "turn_idx").collect()]
    assert actual == replay(log)


# arbitrary JSON-ish values for fuzzing envelope shapes
_json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-2**40, 2**40),
    st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=20))
_json_values = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.text(max_size=8), children, max_size=4)),
    max_leaves=8)

_lines = st.lists(
    st.one_of(
        st.text(max_size=60),                                  # raw garbage
        _json_values.map(lambda v: json.dumps(v)),             # arbitrary JSON
        st.fixed_dictionaries({                                # envelope-ish
            "op": st.sampled_from(["c", "u", "d", "r", "x", ""]),
            "after": st.one_of(st.none(), st.fixed_dictionaries({
                "conv_id": st.one_of(st.none(), st.text(max_size=8)),
                "turn_idx": st.one_of(st.none(), st.integers(-5, 5),
                                      st.text(max_size=3)),
            })),
            "source": st.one_of(st.none(), st.fixed_dictionaries({
                "lsn": st.one_of(st.none(), st.integers(0, 100)),
            })),
        }).map(lambda v: json.dumps(v)),
    ),
    min_size=1, max_size=12,
).filter(lambda ls: all("\n" not in ln and ln.strip() for ln in ls))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=_lines)
def test_parser_total_on_garbage(spark, lines):
    """Every line parses (no exception), yields exactly one event row,
    and the DLQ split partitions the lines exactly: clean events on one
    side, everything else on the other with a reason."""
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    events = E.parse_debezium(df).collect()         # must not raise
    assert len(events) == len(lines)
    good, rej = E.parse_debezium_with_rejects(df)
    n_good, rejects = good.count(), rej.collect()
    assert n_good + len(rejects) == len(lines)
    assert all(r.reject_reason in
               ("corrupt_json", "unknown_op", "missing_key", "invalid_key",
                "missing_lsn")
               for r in rejects)
    # the engine gate agrees with the split: clean events pass the merge
    # validity predicate, i.e. nothing quarantineable leaks through
    from biomedica_etl_spark.cdc.merge import _valid_pred
    assert E.parse_debezium(df).filter(_valid_pred()).count() == n_good


def test_write_debezium_log_is_deterministic(tmp_path):
    """Two independent conversions of the same log are byte-identical —
    the property the driver's dual-process oracle race relies on."""
    log = str(tmp_path / "log")
    generate_change_log(log, GeneratorConfig(
        n_events=1_500, batch_size=400, n_convs=30, duplicate_frac=0.05,
        out_of_order=True))
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    E.write_debezium_log(log, a)
    E.write_debezium_log(log, b)
    fa = sorted(os.listdir(a))
    assert fa == sorted(os.listdir(b))
    for f in fa:
        assert open(os.path.join(a, f), "rb").read() == \
            open(os.path.join(b, f), "rb").read()
