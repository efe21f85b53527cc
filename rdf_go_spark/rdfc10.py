"""RDFC-1.0 (URDNA2015) dataset canonicalization.

From-scratch implementation of the W3C RDF Dataset Canonicalization
algorithm (the reference delegates this to json-gold's URDNA2015,
rdf/jsonld_api.go:297-317; here it is native). Produces the canonical
bnode relabeling ``c14n0, c14n1, …`` and the canonical N-Quads
serialization.

Properties guaranteed (tested): label-permutation invariance — any two
isomorphic datasets yield byte-identical canonical forms; idempotence.

Extension beyond the spec: quoted triples (RDF-star TripleTerm) are
serialized recursively with the same placeholder substitution, so
RDF 1.2 graphs canonicalize deterministically too.
"""

from __future__ import annotations

import hashlib
from itertools import permutations
from typing import Dict, List, Optional, Sequence, Tuple

from .terms import BlankNode, IRI, Literal, Quad, Term, TripleTerm, render_term


def _ser_term(t: Optional[Term], subst: Dict[str, str]) -> str:
    """N-Quads term with bnode labels substituted via ``subst``."""
    if t is None:
        return ""
    if isinstance(t, BlankNode):
        return "_:" + subst.get(t.id, t.id)
    if isinstance(t, TripleTerm):
        return (f"<<( {_ser_term(t.s, subst)} {_ser_term(t.p, subst)} "
                f"{_ser_term(t.o, subst)} )>>")
    return render_term(t)


def _ser_quad(q: Quad, subst: Dict[str, str]) -> str:
    g = "" if q.g is None else " " + _ser_term(q.g, subst)
    return (f"{_ser_term(q.s, subst)} {_ser_term(q.p, subst)} "
            f"{_ser_term(q.o, subst)}{g} .")


def _bnodes_in(t: Optional[Term], acc: set) -> None:
    if isinstance(t, BlankNode):
        acc.add(t.id)
    elif isinstance(t, TripleTerm):
        _bnodes_in(t.s, acc)
        _bnodes_in(t.p, acc)
        _bnodes_in(t.o, acc)


class _Issuer:
    def __init__(self, prefix: str = "c14n"):
        self.prefix = prefix
        self.issued: Dict[str, str] = {}
        self.order: List[str] = []

    def issue(self, bid: str) -> str:
        if bid not in self.issued:
            self.issued[bid] = f"{self.prefix}{len(self.issued)}"
            self.order.append(bid)
        return self.issued[bid]

    def copy(self) -> "_Issuer":
        c = _Issuer(self.prefix)
        c.issued = dict(self.issued)
        c.order = list(self.order)
        return c


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


class _Canonicalizer:
    def __init__(self, quads: Sequence[Quad],
                 max_depth: Optional[int] = None):
        self.quads = list(quads)
        self.bnode_quads: Dict[str, List[Quad]] = {}
        for q in self.quads:
            acc: set = set()
            for t in (q.s, q.p, q.o, q.g):
                if t is not None:
                    _bnodes_in(t, acc)
            for bid in acc:
                self.bnode_quads.setdefault(bid, []).append(q)
        self.canonical = _Issuer("c14n")
        # poison guard scaled to the dataset: legitimate symmetric
        # structures (e.g. a cycle of N indistinguishable bnodes) recurse
        # up to ~N deep; a flat cap of 8 rejected them
        self.max_depth = max_depth if max_depth is not None \
            else max(64, 2 * len(self.bnode_quads))

    # -- 4.6 Hash First Degree Quads ------------------------------------
    def hash_first_degree(self, bid: str) -> str:
        lines = []
        for q in self.bnode_quads.get(bid, []):
            acc: set = set()
            for t in (q.s, q.p, q.o, q.g):
                if t is not None:
                    _bnodes_in(t, acc)
            subst = {x: ("a" if x == bid else "z") for x in acc}
            lines.append(_ser_quad(q, subst))
        return _sha256("\n".join(sorted(lines)) + "\n")

    # -- 4.7 Hash Related Blank Node ------------------------------------
    def hash_related(self, related: str, q: Quad, issuer: _Issuer,
                     position: str) -> str:
        ident = "_:" + (self.canonical.issued.get(related)
                        or issuer.issued.get(related)
                        or self.hash_first_degree(related))
        inp = position
        if position != "g":
            inp += "<" + q.p.value + ">" if isinstance(q.p, IRI) else ""
        inp += ident
        return _sha256(inp)

    # -- 4.8 Hash N-Degree Quads -----------------------------------------
    def hash_n_degree(self, bid: str, issuer: _Issuer,
                      depth: int = 0) -> Tuple[str, _Issuer]:
        if depth > self.max_depth:  # poison guard (spec permits limits)
            raise ValueError("rdfc10: recursion limit exceeded")
        hn: Dict[str, List[str]] = {}
        for q in self.bnode_quads.get(bid, []):
            for pos, term in (("s", q.s), ("o", q.o), ("g", q.g)):
                acc: set = set()
                _bnodes_in(term, acc) if term is not None else None
                for related in acc:
                    if related == bid:
                        continue
                    h = self.hash_related(related, q, issuer, pos)
                    hn.setdefault(h, []).append(related)
        data_to_hash = ""
        for related_hash in sorted(hn):
            data_to_hash += related_hash
            chosen_path = ""
            chosen_issuer: Optional[_Issuer] = None
            blank_nodes = sorted(set(hn[related_hash]))
            for perm in permutations(blank_nodes):
                issuer_copy = issuer.copy()
                path = ""
                recursion: List[str] = []
                ok = True
                for related in perm:
                    if related in self.canonical.issued:
                        path += "_:" + self.canonical.issued[related]
                    else:
                        if related not in issuer_copy.issued:
                            recursion.append(related)
                        path += "_:" + issuer_copy.issue(related)
                    if chosen_path and len(path) >= len(chosen_path) and \
                            path > chosen_path:
                        ok = False
                        break
                if not ok:
                    continue
                for related in recursion:
                    result_hash, result_issuer = self.hash_n_degree(
                        related, issuer_copy, depth + 1)
                    path += "_:" + issuer_copy.issue(related)
                    path += "<" + result_hash + ">"
                    issuer_copy = result_issuer
                    if chosen_path and len(path) >= len(chosen_path) and \
                            path > chosen_path:
                        ok = False
                        break
                if not ok:
                    continue
                if not chosen_path or path < chosen_path:
                    chosen_path = path
                    chosen_issuer = issuer_copy
            data_to_hash += chosen_path
            if chosen_issuer is not None:
                issuer = chosen_issuer
        return _sha256(data_to_hash), issuer

    # -- 4.4 main ---------------------------------------------------------
    def run(self) -> Dict[str, str]:
        simple: Dict[str, List[str]] = {}
        for bid in self.bnode_quads:
            simple.setdefault(self.hash_first_degree(bid), []).append(bid)
        non_unique: List[List[str]] = []
        for h in sorted(simple):
            ids = simple[h]
            if len(ids) == 1:
                self.canonical.issue(ids[0])
            else:
                non_unique.append(sorted(ids))
        for ids in non_unique:
            hash_path_list = []
            for bid in ids:
                if bid in self.canonical.issued:
                    continue
                temp = _Issuer("b")
                temp.issue(bid)
                hash_path_list.append(self.hash_n_degree(bid, temp))
            for _h, issuer in sorted(hash_path_list, key=lambda x: x[0]):
                for bid in issuer.order:
                    self.canonical.issue(bid)
        return dict(self.canonical.issued)


def canonicalize(quads: Sequence[Quad],
                 max_depth: Optional[int] = None
                 ) -> Tuple[List[str], Dict[str, str]]:
    """RDFC-1.0: returns (sorted canonical N-Quads lines, bnode label map).
    ``max_depth`` overrides the scaled hash-n-degree recursion guard."""
    canon = _Canonicalizer(quads, max_depth=max_depth)
    mapping = canon.run()
    lines = sorted(set(_ser_quad(q, mapping) for q in quads))
    return lines, mapping
