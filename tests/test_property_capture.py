"""Property-based hardening of the parity capture engine: random JSON
trees × random pointers, checked against an independent naive
resolver (dict/list walk with duplicate-key multi-match). Pure
Python — no Spark session, so the generator budget can be generous.

Reference invariants exercised (SURVEY §2.5): missing → MISSING (SQL
NULL) vs captured JSON null; duplicate keys → last writer wins per
capture slot (TreeBasedCapturer LWW semantics); decimal segments
resolve array indices AND same-named object members; '/' captures the
whole document; canonical encode round-trips json.loads.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from embulk_util_json_spark.functions import json_values as jv
from embulk_util_json_spark.plans.capture_spec import CaptureSpec
from embulk_util_json_spark.plans.pointer import split_pointer

# JSON trees: keys avoid '/' and '~' (escaping is covered by direct
# pointer tests) and digits-only keys are allowed on purpose (the
# index-vs-member ambiguity case).
_key = st.one_of(
    st.text(alphabet="abcxyz", min_size=1, max_size=3),
    st.sampled_from(["0", "1", "2"]),
)
_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.text(alphabet="ab é", max_size=6),
)
_tree = st.recursive(
    _scalar,
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(_key, kids, max_size=4),
    ),
    max_leaves=20,
)
_pointer = st.one_of(
    st.just("/"),
    st.lists(_key, min_size=1, max_size=3).map(lambda ks: "/" + "/".join(ks)),
)


def naive_matches(value, tokens):
    """Independent resolver: ALL matches of the pointer path, document
    order; duplicate keys each match (JsonObjectPairs preserves them)."""
    if not tokens:
        return [value]
    head, rest = tokens[0], tokens[1:]
    out = []
    if isinstance(value, jv.JsonObjectPairs):
        for k, v in value:
            if k == head:
                out.extend(naive_matches(v, rest))
    elif isinstance(value, dict):
        if head in value:
            out.extend(naive_matches(value[head], rest))
    elif isinstance(value, list):
        if head.isdigit() and int(head) < len(value):
            out.extend(naive_matches(value[int(head)], rest))
    return out


@settings(max_examples=300, deadline=None)
@given(doc=_tree, pointers=st.lists(_pointer, min_size=1, max_size=4, unique=True))
def test_capture_matches_naive_resolver(doc, pointers):
    text = json.dumps(doc)
    spec = CaptureSpec.compile(pointers)
    parsed = next(jv.iter_documents(text, jv.DEFAULT_OPTIONS))
    cells = jv.capture(parsed, spec.tree)
    for ptr, cell in zip(spec.pointers, cells):
        tokens = [] if ptr == "/" else split_pointer(ptr)
        wanted = naive_matches(parsed, tokens)
        if not wanted:
            assert cell is jv.MISSING, (ptr, doc)
        else:
            # slot semantics: LAST match wins (capture-slot LWW,
            # TestCapturingJsonPointerList duplicate-key cases)
            assert cell is not jv.MISSING, (ptr, doc)
            assert jv.encode(cell, False) == jv.encode(wanted[-1], False), (
                ptr,
                doc,
            )


@settings(max_examples=200, deadline=None)
@given(doc=_tree)
def test_encode_roundtrips_json(doc):
    text = json.dumps(doc)
    parsed = next(jv.iter_documents(text, jv.DEFAULT_OPTIONS))
    # canonical encode must be valid JSON and value-equal to the source
    assert json.loads(jv.encode(parsed, False)) == doc


@settings(max_examples=200, deadline=None)
@given(docs=st.lists(_tree, min_size=1, max_size=4))
def test_concatenated_stream_splits(docs):
    # Two concatenated bare numbers ("1" + "0") are textually ONE
    # document — Jackson (the reference) reads "10" as a single token,
    # and so do we. A valid multi-document stream either uses
    # self-delimiting values (objects/arrays) or whitespace
    # separation; generate the latter, which covers both.
    text = "\n".join(json.dumps(d) for d in docs)
    out = list(jv.iter_documents(text, jv.DEFAULT_OPTIONS))
    assert len(out) == len(docs)
    for got, want in zip(out, docs):
        assert json.loads(jv.encode(got, False)) == want


@settings(max_examples=100, deadline=None)
@given(docs=st.lists(_tree.filter(lambda d: isinstance(d, (dict, list))),
                     min_size=1, max_size=4))
def test_concatenated_containers_split_without_separator(docs):
    # self-delimiting documents split with NO separator at all —
    # the reference's '{...}{...}' case (TestJsonParser concatenated)
    text = "".join(json.dumps(d) for d in docs)
    out = list(jv.iter_documents(text, jv.DEFAULT_OPTIONS))
    assert len(out) == len(docs)
    for got, want in zip(out, docs):
        assert json.loads(jv.encode(got, False)) == want
