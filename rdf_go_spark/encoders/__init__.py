"""Canonical encoders (sinks). N-Triples rendering is the pipeline's
interchange form; other formats layer on top of it.

Parity: rdf/ntriples.go:613-677 (NT/NQ lines), rdf/turtle_encoder.go
(sorted prefix header + QName abbreviation), rdf/jsonld.go:837-977.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Optional

from ..terms import (
    IRI, BlankNode, Literal, Quad, Term, TripleTerm, render_iri,
    render_term, render_term_cg,
)


def render_ntriples_line(q: Quad, star_semantics: str = "rdf12") -> str:
    """One N-Triples line incl. trailing ' .' (rdf/ntriples.go:613-626).
    ``star_semantics="cg"`` renders quoted triples as direct
    ``<< s p o >>`` terms (round-trip partner of the CG parse mode)."""
    rt = render_term_cg if star_semantics == "cg" else render_term
    return f"{rt(q.s)} {render_term(q.p)} {rt(q.o)} ."


def render_nquads_line(q: Quad) -> str:
    """One N-Quads line; graph omitted when default (rdf/ntriples.go:657-677)."""
    if q.g is None:
        return render_ntriples_line(q)
    return f"{render_term(q.s)} {render_term(q.p)} {render_term(q.o)} {render_term(q.g)} ."


def encode_ntriples(quads: Iterable[Quad],
                    star_semantics: str = "rdf12") -> str:
    return "".join(render_ntriples_line(q, star_semantics) + "\n"
                   for q in quads)


def encode_nquads(quads: Iterable[Quad]) -> str:
    return "".join(render_nquads_line(q) + "\n" for q in quads)


# ---------------------------------------------------------------------------
# Turtle / TriG
# ---------------------------------------------------------------------------

def _abbreviate(value: str, prefixes: Dict[str, str]) -> Optional[str]:
    """Longest-namespace-match QName abbreviation
    (rdf/turtle_encoder.go:259-291)."""
    best_prefix, best_ns = None, ""
    for prefix, ns in prefixes.items():
        if value.startswith(ns) and len(ns) > len(best_ns):
            local = value[len(ns):]
            if local and all(c.isalnum() or c in "_-." for c in local) \
                    and not local.startswith(".") and not local.endswith("."):
                best_prefix, best_ns = prefix, ns
    if best_prefix is None:
        return None
    return f"{best_prefix}:{value[len(best_ns):]}"


def _turtle_term(t: Term, prefixes: Dict[str, str],
                 star_semantics: str = "rdf12") -> str:
    if isinstance(t, IRI):
        abbr = _abbreviate(t.value, prefixes)
        return abbr if abbr is not None else render_iri(t.value)
    if isinstance(t, Literal) and t.datatype:
        # c14n_quote (as render_term uses) — go_quote's \v/\a/\xNN escapes
        # are not legal Turtle ECHARs and our own parser rejects them
        from ..terms import c14n_quote
        abbr = _abbreviate(t.datatype, prefixes)
        if abbr is not None:
            return f"{c14n_quote(t.lexical)}^^{abbr}"
    if isinstance(t, TripleTerm) and star_semantics == "cg":
        return render_term_cg(t)
    return render_term(t)


def encode_turtle(quads: Iterable[Quad], prefixes: Optional[Dict[str, str]] = None,
                  base: str = "", star_semantics: str = "rdf12") -> str:
    """Turtle with alphabetically sorted @prefix header; statements stay in
    input order (rdf/turtle_encoder.go:85-109,222-229; README.md:864-866).
    ``star_semantics="cg"`` renders quoted triples as direct terms."""
    prefixes = prefixes or {}
    lines: List[str] = []
    if base:
        lines.append(f"@base <{base}> .")
    for prefix in sorted(prefixes):
        lines.append(f"@prefix {prefix}: <{prefixes[prefix]}> .")
    if lines:
        lines.append("")
    for q in quads:
        lines.append(
            f"{_turtle_term(q.s, prefixes, star_semantics)} "
            f"{_turtle_term(q.p, prefixes, star_semantics)} "
            f"{_turtle_term(q.o, prefixes, star_semantics)} .")
    return "\n".join(lines) + "\n"


def encode_trig(quads: Iterable[Quad], prefixes: Optional[Dict[str, str]] = None,
                base: str = "", star_semantics: str = "rdf12") -> str:
    """TriG: Turtle header + per-quad graph blocks
    (rdf/turtle_encoder.go:127-175)."""
    prefixes = prefixes or {}
    lines: List[str] = []
    if base:
        lines.append(f"@base <{base}> .")
    for prefix in sorted(prefixes):
        lines.append(f"@prefix {prefix}: <{prefixes[prefix]}> .")
    if lines:
        lines.append("")
    for q in quads:
        stmt = (f"{_turtle_term(q.s, prefixes, star_semantics)} "
                f"{_turtle_term(q.p, prefixes, star_semantics)} "
                f"{_turtle_term(q.o, prefixes, star_semantics)} .")
        if q.g is None:
            lines.append(stmt)
        else:
            lines.append(f"{_turtle_term(q.g, prefixes)} {{")
            lines.append(f"  {stmt}")
            lines.append("}")
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# JSON-LD
# ---------------------------------------------------------------------------

def _jsonld_node_ref(t: Term):
    if isinstance(t, IRI):
        return {"@id": t.value}
    if isinstance(t, BlankNode):
        return {"@id": f"_:{t.id}"}
    raise TypeError(f"not a node: {t!r}")


def _jsonld_object(t: Term):
    if isinstance(t, Literal):
        from ..terms import XSD_STRING
        if t.lang:
            return {"@value": t.lexical, "@language": t.lang}
        if t.datatype and t.datatype != XSD_STRING:
            return {"@value": t.lexical, "@type": t.datatype}
        return {"@value": t.lexical}
    return _jsonld_node_ref(t)


def encode_jsonld(quads: Iterable[Quad]) -> str:
    """Deterministic JSON-LD (@graph of node objects, sorted keys).

    The reference's encoder iterates Go maps (non-deterministic key order,
    README.md:879-901); we sort keys so output is stable for free.
    Named-graph quads become nested ``{"@id": g, "@graph": [...]}`` nodes
    instead of being silently flattened into the default graph (the
    reference encoder is triples-only, so it never had this hazard).
    """
    # graph name -> (node order, nodes); None key = default graph
    graphs: Dict[Optional[str], tuple] = {}
    gorder: List[Optional[str]] = []
    for q in quads:
        gid = None if q.g is None else (
            q.g.value if isinstance(q.g, IRI) else f"_:{q.g.id}")
        if gid not in graphs:
            graphs[gid] = ([], {})
            gorder.append(gid)
        order, nodes = graphs[gid]
        sid = q.s.value if isinstance(q.s, IRI) else f"_:{q.s.id}"
        node = nodes.get(sid)
        if node is None:
            node = {"@id": sid}
            nodes[sid] = node
            order.append(sid)
        obj = _jsonld_object(q.o)
        existing = node.get(q.p.value)
        if existing is None:
            node[q.p.value] = obj
        elif isinstance(existing, list):
            existing.append(obj)
        else:
            node[q.p.value] = [existing, obj]
    top: List[dict] = []
    for gid in gorder:
        order, nodes = graphs[gid]
        members = [nodes[k] for k in order]
        if gid is None:
            top.extend(members)
        else:
            top.append({"@id": gid, "@graph": members})
    doc = {"@graph": top}
    return json.dumps(doc, sort_keys=True, ensure_ascii=False)


# ---------------------------------------------------------------------------
# RDF/XML
# ---------------------------------------------------------------------------

def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _split_qname(iri: str):
    """Split an IRI at the last #, / or : for QName minting
    (rdf/rdfxml_encoder.go:220-231)."""
    for i in range(len(iri) - 1, -1, -1):
        if iri[i] in "#/:":
            local = iri[i + 1:]
            if local and (local[0].isalpha() or local[0] == "_") \
                    and all(c.isalnum() or c in "_-." for c in local):
                return iri[:i + 1], local
            break
    return None


def encode_rdfxml(quads: Iterable[Quad]) -> str:
    """One rdf:Description per triple with auto-minted ns%d prefixes
    (rdf/rdfxml_encoder.go:57-134,199-218)."""
    ns_map: Dict[str, str] = {}  # namespace -> prefix
    body: List[str] = []
    auto_seq = 0
    quads = list(quads)
    for q in quads:
        split = _split_qname(q.p.value)
        if split is None:
            continue
        ns, _ = split
        if ns not in ns_map and ns != "http://www.w3.org/1999/02/22-rdf-syntax-ns#":
            ns_map[ns] = f"ns{auto_seq}"
            auto_seq += 1
    for q in quads:
        split = _split_qname(q.p.value)
        if split is None:
            raise ValueError(f"cannot abbreviate predicate {q.p.value}")
        ns, local = split
        prefix = "rdf" if ns == "http://www.w3.org/1999/02/22-rdf-syntax-ns#" else ns_map[ns]
        if isinstance(q.s, IRI):
            subj_attr = f'rdf:about="{_xml_escape(q.s.value)}"'
        else:
            subj_attr = f'rdf:nodeID="{q.s.id}"'
        if isinstance(q.o, Literal):
            dt = f' rdf:datatype="{_xml_escape(q.o.datatype)}"' if q.o.datatype else ""
            lang = f' xml:lang="{_xml_escape(q.o.lang)}"' if q.o.lang else ""
            inner = (f"<{prefix}:{local}{dt}{lang}>"
                     f"{_xml_escape(q.o.lexical)}</{prefix}:{local}>")
        elif isinstance(q.o, IRI):
            inner = f'<{prefix}:{local} rdf:resource="{_xml_escape(q.o.value)}"/>'
        else:
            inner = f'<{prefix}:{local} rdf:nodeID="{q.o.id}"/>'
        body.append(f'  <rdf:Description {subj_attr}>\n    {inner}\n  </rdf:Description>')
    decls = ['xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"']
    for ns, prefix in sorted(ns_map.items(), key=lambda kv: kv[1]):
        decls.append(f'xmlns:{prefix}="{_xml_escape(ns)}"')
    header = '<?xml version="1.0" encoding="UTF-8"?>\n<rdf:RDF ' + " ".join(decls) + ">"
    return header + "\n" + "\n".join(body) + "\n</rdf:RDF>\n"
