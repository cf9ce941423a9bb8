"""Build a sentencepiece-format precompiled charsmap for test fixtures.

Constructs a genuine darts-clone double-array trie (the unit encoding
`intrepppid_tpu/data/spm/charsmap.py` documents) over a rule map
``{utf8_key_bytes: replacement_bytes}`` and serializes the
``[uint32 trie_size | trie | replacement blob]`` layout. The resulting
blob is validated through the INDEPENDENT HF `tokenizers` Rust
``Precompiled`` normalizer in the golden tests — if the layout or unit
encoding were wrong, the Rust side would not reproduce the rules.
"""
from __future__ import annotations

import struct
from typing import Dict


def build_charsmap(rules: Dict[bytes, bytes]) -> bytes:
    # replacement blob: NUL-terminated strings, deduplicated
    blob = bytearray()
    value_of: Dict[bytes, int] = {}
    for rep in rules.values():
        if rep not in value_of:
            value_of[rep] = len(blob)
            blob += rep + b"\0"

    # byte trie
    class Node:
        __slots__ = ("children", "value")

        def __init__(self):
            self.children: Dict[int, "Node"] = {}
            self.value = None

    root = Node()
    for key, rep in rules.items():
        if not key:
            raise ValueError("empty charsmap key")
        node = root
        for b in key:
            node = node.children.setdefault(b, Node())
        node.value = value_of[rep]

    units: Dict[int, int] = {}  # position -> unit (built sparsely)
    used = set()
    # Base exclusivity (darts-clone's is_used_[offset] rule): if two nodes
    # shared a base B, every child of one would be a phantom transition of
    # the other (the reader probes B ^ c and the label byte would match).
    used_bases = set()
    bases = []  # node_pos ^ offset per placed node, for final sizing

    def place(node: Node, node_pos: int) -> int:
        """Choose this node's offset, reserve its slots, write its value
        unit, recurse into children, and return the offset."""
        labels = sorted(node.children)
        slots = ([0] if node.value is not None else []) + labels
        offset = 1
        while True:
            base = node_pos ^ offset
            positions = [base ^ c for c in slots]
            if (
                offset < (1 << 21)
                and base not in used_bases
                and all(p not in used for p in positions)
            ):
                break
            offset += 1
        for p in positions:
            used.add(p)
        used_bases.add(base)
        bases.append(base)
        if node.value is not None:
            units[node_pos ^ offset] = 0x80000000 | node.value
        for c in labels:
            child = node.children[c]
            child_pos = node_pos ^ offset ^ c
            child_offset = place(child, child_pos)
            unit = c | ((1 << 8) if child.value is not None else 0)
            unit |= child_offset << 10
            units[child_pos] = unit
        return offset

    used.add(0)
    root_offset = place(root, 0)
    units[0] = root_offset << 10

    # size so that EVERY possible transition base ^ c (c in 0..255) is
    # in-bounds: real darts blobs allocate whole 256-unit blocks, and the
    # HF Rust reader (like darts-clone itself) indexes without bounds
    # checks — zero-filled cells fail the label comparison harmlessly
    size = (max(max(bases), max(units)) | 0xFF) + 1
    arr = [0] * size
    for p, u in units.items():
        arr[p] = u
    trie = struct.pack(f"<{size}I", *arr)
    return struct.pack("<I", len(trie)) + trie + bytes(blob)


if __name__ == "__main__":
    blob = build_charsmap({b"\t": b" ", "Ａ".encode(): b"A"})
    print(len(blob), "bytes")
