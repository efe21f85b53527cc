"""Blank-node-insensitive graph comparison.

Backtracking bijection search over blank-node labels with degree-signature
pruning — same capability as the reference's test-side isomorphism check
(rdf/roundtrip_test.go:202-242), implemented independently.

At pipeline scale we never run this (deterministic skolemization makes exact
joins sufficient, SURVEY.md §2.3); this is the verification-harness tool for
W3C eval fixtures whose expected files use arbitrary bnode labels.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from .terms import BlankNode, IRI, Literal, Quad, Term, TripleTerm, render_term


def _term_sig(t: Term, mapping: Dict[str, str]) -> str:
    """Render with bnode labels replaced via mapping ('?' if unmapped)."""
    if isinstance(t, BlankNode):
        return "_:" + mapping.get(t.id, "?")
    if isinstance(t, TripleTerm):
        return (f"<<( {_term_sig(t.s, mapping)} {_term_sig(t.p, mapping)} "
                f"{_term_sig(t.o, mapping)} )>>")
    return render_term(t)


def _quad_sig(q: Quad, mapping: Dict[str, str]) -> str:
    g = "" if q.g is None else " " + _term_sig(q.g, mapping)
    return (f"{_term_sig(q.s, mapping)} {_term_sig(q.p, mapping)} "
            f"{_term_sig(q.o, mapping)}{g}")


def _collect_bnodes(t: Term, acc: set) -> None:
    if isinstance(t, BlankNode):
        acc.add(t.id)
    elif isinstance(t, TripleTerm):
        _collect_bnodes(t.s, acc)
        _collect_bnodes(t.p, acc)
        _collect_bnodes(t.o, acc)


def bnode_ids(quads: Iterable[Quad]) -> List[str]:
    acc: set = set()
    for q in quads:
        for t in (q.s, q.p, q.o, q.g):
            if t is not None:
                _collect_bnodes(t, acc)
    return sorted(acc)


def _ground_signature(quads: Sequence[Quad]) -> Counter:
    """Multiset of quad signatures with every bnode anonymized."""
    return Counter(_quad_sig(q, {}) for q in quads)


def _bnode_local_sig(quads: Sequence[Quad], bid: str) -> Counter:
    """Per-bnode neighborhood signature used to prune candidates."""
    sig: Counter = Counter()
    one = {bid: "X"}
    for q in quads:
        s = _quad_sig(q, one)
        if "_:X" in s:
            sig[s] += 1
    return sig


def find_bnode_mapping(a: Sequence[Quad], b: Sequence[Quad]
                       ) -> Optional[Dict[str, str]]:
    """Bijection from a's bnode labels to b's making the graphs equal,
    or None."""
    if len(a) != len(b):
        return None
    if _ground_signature(a) != _ground_signature(b):
        return None
    bn_a, bn_b = bnode_ids(a), bnode_ids(b)
    if len(bn_a) != len(bn_b):
        return None
    sig_a = {x: _bnode_local_sig(a, x) for x in bn_a}
    sig_b = {y: _bnode_local_sig(b, y) for y in bn_b}
    candidates = {x: [y for y in bn_b if sig_a[x] == sig_b[y]] for x in bn_a}
    order = sorted(bn_a, key=lambda x: len(candidates[x]))
    target = Counter(_quad_sig(q, {y: y for y in bn_b}) for q in b)

    def ok(mapping: Dict[str, str]) -> bool:
        got = Counter(_quad_sig(q, mapping) for q in a)
        # partial check: every fully-mapped signature must appear in target
        for s, c in got.items():
            if "_:?" not in s and target[s] < c:
                return False
        return True

    used: set = set()
    mapping: Dict[str, str] = {}

    def backtrack(i: int) -> bool:
        if i == len(order):
            return Counter(_quad_sig(q, mapping) for q in a) == target
        x = order[i]
        for y in candidates[x]:
            if y in used:
                continue
            mapping[x] = y
            used.add(y)
            if ok(mapping) and backtrack(i + 1):
                return True
            del mapping[x]
            used.discard(y)
        return False

    return dict(mapping) if backtrack(0) else None


def isomorphic(a: Sequence[Quad], b: Sequence[Quad]) -> bool:
    return find_bnode_mapping(a, b) is not None


def canonical_labels(quads: Sequence[Quad]) -> Dict[str, str]:
    """Deterministic bnode relabeling ``c0, c1, …`` by sorted first
    occurrence in the anonymized-then-sorted quad rendering — the
    reference's sorted-relabel trick (rdf/jsonld_api.go:319-352), used for
    P/R scoring up to relabeling without full canonicalization.

    Not a graph canonicalization (co-occurring symmetric bnodes can tie);
    ties broken by local signature then original label, which is stable
    for the deterministic pipelines here."""
    ids = bnode_ids(quads)
    keyed = []
    for bid in ids:
        sig = tuple(sorted(_bnode_local_sig(quads, bid).items()))
        keyed.append((sig, bid))
    keyed.sort()
    return {bid: f"c{i}" for i, (_sig, bid) in enumerate(keyed)}


def relabel(quads: Sequence[Quad], mapping: Dict[str, str]) -> List[str]:
    """Render quads with bnode labels replaced; sorted line list."""
    full = dict(mapping)
    return sorted(_quad_sig(q, full) for q in quads)
