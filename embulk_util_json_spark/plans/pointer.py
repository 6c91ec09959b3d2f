"""RFC 6901 JSON Pointers and the shared-prefix pointer tree.

Semantics match the reference's pointer handling
(reference: JsonPointerTree.java:87-178, CapturingPointers.java:82-201):

- A capturing pointer is either a JSON Pointer string (``/foo``,
  ``/qux/hoge``, ``/a/1/b``, ``/``) or a direct member name.
- The empty pointer ``""`` is rejected (JsonPointerTree.java:118-120).
- The pointer ``"/"`` captures the *whole current document*
  (JsonPointerTree.java:122-125; TestJsonValueParser.java:159-181).
  NOTE: this deviates from strict RFC 6901 (where ``/`` names the
  empty-string member) but is the reference's documented behavior.
- Member names are escaped into pointer segments with ``~`` → ``~0``
  and ``/`` → ``~1`` (CapturingPointers.java:194-201;
  TestCapturingPointers.java:27-36), and unescaped on split
  (``~1`` → ``/`` then ``~0`` → ``~``, in that order).
- Array indices are matched as decimal strings ("1" matches index 1;
  TreeBasedCapturer.java:115-141).

The tree is driver-side compile state only: it exists to (a) derive
the minimal pruned ``from_json`` schema for the built-in strategy and
(b) guide the single-pass match in the Arrow parity engine. It is
built once per CaptureSpec and shipped to executors inside the UDF
closure (amortized across all rows, as the reference's javadoc advises
for its matching tree, JsonPointerTree.java:110-112).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class JsonPointerError(ValueError):
    """Invalid JSON Pointer (compile-time error, not a data error)."""


def escape_member_name(name: str) -> str:
    """Escape one member name into a single-segment JSON Pointer.

    ``~`` → ``~0`` first, then ``/`` → ``~1``
    (reference CapturingPointers.java:194-201).
    """
    return "/" + name.replace("~", "~0").replace("/", "~1")


def unescape_token(token: str) -> str:
    """Unescape one pointer segment: ``~1`` → ``/`` then ``~0`` → ``~``."""
    return token.replace("~1", "/").replace("~0", "~")


def split_pointer(pointer: str) -> list[str]:
    """Split a JSON Pointer into unescaped segment tokens.

    ``"/"`` returns ``[]`` (whole-document capture). The empty pointer
    is rejected, as is any pointer not starting with ``/``
    (reference JsonPointerTree.java:118-125,160-173).

    >>> split_pointer("/a~0b/~01/~1")
    ['a~b', '~1', '/']
    """
    if pointer == "":
        raise JsonPointerError("Empty JSON Pointer is not allowed for capture")
    if not pointer.startswith("/"):
        raise JsonPointerError(f"JSON Pointer must start with '/': {pointer!r}")
    if pointer == "/":
        return []
    return [unescape_token(t) for t in pointer[1:].split("/")]


@dataclass
class PointerTreeNode:
    """One node of the shared-prefix tree.

    ``captures`` holds output-column indices that capture the value at
    this node; ``children`` maps the next segment token (member name or
    decimal array index, both as strings) to the child node.
    """

    captures: list[int] = field(default_factory=list)
    children: dict[str, "PointerTreeNode"] = field(default_factory=dict)

    @property
    def is_leaf(self) -> bool:
        return not self.children


class PointerTree:
    """Shared-prefix tree over K capturing pointers.

    Mirrors the *result* of JsonPointerTree.java:69-312 (shared
    prefixes collapse; one node may both capture and have children,
    so overlapping pointers like ``/qux`` and ``/qux/hoge`` capture
    independently — TestCapturingJsonPointerList.java:442-463).
    """

    def __init__(self) -> None:
        self.root = PointerTreeNode()
        self.width = 0

    @classmethod
    def build(cls, pointers: list[str]) -> "PointerTree":
        tree = cls()
        for i, ptr in enumerate(pointers):
            tree.add(ptr, i)
        return tree

    def add(self, pointer: str, capture_index: int) -> None:
        tokens = split_pointer(pointer)
        node = self.root
        for tok in tokens:
            node = node.children.setdefault(tok, PointerTreeNode())
        node.captures.append(capture_index)
        self.width = max(self.width, capture_index + 1)

    def max_depth(self) -> int:
        def depth(node: PointerTreeNode) -> int:
            if not node.children:
                return 0
            return 1 + max(depth(c) for c in node.children.values())

        return depth(self.root)

    def all_segments_are_names(self) -> bool:
        """True if no segment is a decimal array index (pure member paths)."""

        def walk(node: PointerTreeNode) -> bool:
            for tok, child in node.children.items():
                if tok.isdigit():
                    return False
                if not walk(child):
                    return False
            return True

        return walk(self.root)
