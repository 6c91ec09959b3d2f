"""Property-based hardening of the CDC envelope parse: for random
batches mixing well-formed envelopes (random field subsets, extra
fields, unicode text, nulls) with malformed junk, the single-pass map
parse must (a) never fail the job, (b) agree field-by-field with a
pure-Python json.loads reference, (c) classify exactly the junk rows
as malformed (op/key NULL — the row-skippable taxonomy), and (d) land
every unknown data member in the extras map.

One Spark roundtrip per example → small example budget, many rows per
example.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from embulk_util_json_spark.sources.events import (
    BASE_DATA_FIELDS,
    parse_change_events_single_pass,
)

_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00"
    ),
    max_size=12,
)
_extra_key = st.sampled_from(["model", "lang", "score", "zz9"])

_good = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["insert", "update", "delete"]),
        "ts": st.sampled_from(
            ["2024-01-01T00:00:01", "2024-06-30T23:59:59", "2024-02-29T12:00:00"]
        ),
    },
    optional={},
).flatmap(
    lambda env: st.fixed_dictionaries(
        {
            "conv_id": st.one_of(st.none(), _text),
            "turn_idx": st.one_of(st.none(), st.integers(-5, 30)),
            "role": st.one_of(st.none(), _text),
            "text": _text,
            "tool": st.one_of(st.none(), _text),
        },
        optional={k: _text for k in ["model", "lang", "score", "zz9"]},
    ).map(lambda data: {**env, "data": data})
)

_junk = st.sampled_from(
    [
        "",
        "not json",
        "[1, 2, 3]",
        '"just a string"',
        "{\"op\": \"insert\"",  # truncated
        "{}",
        '{"op": null, "data": null}',
        '{"data": {"conv_id": "c"}}',  # no op
    ]
)

_row = st.one_of(st.tuples(st.just("good"), _good), st.tuples(st.just("junk"), _junk))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=st.lists(_row, min_size=1, max_size=30))
def test_envelope_parse_matches_python_reference(spark, rows):
    payload = []
    for i, (kind, v) in enumerate(rows):
        payload.append((i, v if kind == "junk" else json.dumps(v)))
    df = spark.createDataFrame(payload, "seq long, event_json string")
    got = {
        r.seq: r.asDict()
        for r in parse_change_events_single_pass(df).collect()
    }
    assert set(got) == set(range(len(rows)))

    base = {n for n, _ in BASE_DATA_FIELDS}
    for i, (kind, v) in enumerate(rows):
        r = got[i]
        if kind == "junk":
            d = None
            try:
                d = json.loads(v)
            except (ValueError, TypeError):
                pass
            ok_dict = isinstance(d, dict)
            op = d.get("op") if ok_dict else None
            assert r["op"] == op
            # junk taxonomy (the quarantine predicate): op OR key NULL
            assert r["op"] is None or r["conv_id"] is None
            continue
        assert r["op"] == v["op"]
        data = v["data"]
        assert r["conv_id"] == data.get("conv_id")
        assert r["role"] == data.get("role")
        assert r["text"] == data.get("text")
        assert r["tool"] == data.get("tool")
        ti = data.get("turn_idx")
        assert r["turn_idx"] == ti
        # every unknown member (non-null) rides the extras map
        want_extras = {
            k: str(val)
            for k, val in data.items()
            if k not in base and val is not None
        }
        assert dict(r["_extras"] or {}) == want_extras
        assert r["ts"] is not None
