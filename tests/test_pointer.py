"""Pointer/escaping/tree tests — ported assertions from
TestCapturingPointers.java:26-39 and TestJsonPointerTree.java:33-118."""

import pytest

from embulk_util_json_spark.plans.pointer import (
    JsonPointerError,
    PointerTree,
    escape_member_name,
    split_pointer,
)


# Verbatim escaping table from TestCapturingPointers.java:27-36.
ESCAPE_CASES = [
    ("foo", "/foo"),
    ("", "/"),
    ("~", "/~0"),
    ("/", "/~1"),
    ("~/", "/~0~1"),
    ("/~", "/~1~0"),
    ("~0~0", "/~00~00"),
    ("~1~1", "/~01~01"),
]


@pytest.mark.parametrize("name,expected", ESCAPE_CASES)
def test_escape_member_name(name, expected):
    assert escape_member_name(name) == expected


def test_split_unescape():
    # TestJsonPointerTree.java:64-88
    assert split_pointer("/a~0b/~01/~1") == ["a~b", "~1", "/"]
    assert split_pointer("/foo/bar") == ["foo", "bar"]
    assert split_pointer("/a/1/b") == ["a", "1", "b"]


def test_root_pointer_is_whole_document():
    # JsonPointerTree.java:122-125 — "/" is whole-value capture.
    assert split_pointer("/") == []


def test_empty_pointer_rejected():
    # JsonPointerTree.java:118-120
    with pytest.raises(JsonPointerError):
        split_pointer("")


def test_pointer_must_start_with_slash():
    with pytest.raises(JsonPointerError):
        split_pointer("foo/bar")


def test_tree_shared_prefix():
    # TestJsonPointerTree.java:33-62 — shared prefixes collapse; a node
    # may both capture and have children (overlap, e.g. /qux + /qux/hoge).
    tree = PointerTree.build(["/qux", "/qux/hoge", "/bar", "/"])
    assert tree.width == 4
    assert tree.root.captures == [3]  # "/" captures at the root
    qux = tree.root.children["qux"]
    assert qux.captures == [0]
    assert qux.children["hoge"].captures == [1]
    assert tree.root.children["bar"].captures == [2]
    assert tree.max_depth() == 2


def test_tree_array_index_segments():
    tree = PointerTree.build(["/a/1/b"])
    assert not tree.all_segments_are_names()
    tree2 = PointerTree.build(["/a/b", "/c"])
    assert tree2.all_segments_are_names()
