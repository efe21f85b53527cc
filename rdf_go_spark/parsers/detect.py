"""Format auto-detection + unified parse dispatch.

Heuristics mirror the reference (rdf/format_detect.go:17-169,
rdf/api.go:229-252): sniff the first 512 chars — JSON braces → JSON-LD,
``<?xml``/``<rdf`` → RDF/XML, directives → Turtle/TriG (graph braces ⇒
TriG), bare ``<``/``_:`` lines → N-Triples/N-Quads (4 terms ⇒ N-Quads).

In Spark this runs as a column expression chain or inside the parse UDF;
``parse_any`` is the single entry the mapInPandas wrapper uses
(reference analogue: NewReader dispatch rdf/api.go:255-309).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Tuple

from ..terms import BlankNode, ParseError, Quad, TripleTerm
from .jsonld import parse_jsonld
from .ntriples import parse_document as parse_nt_document
from .rdfxml import parse_rdfxml
from .trig import parse_trig
from .turtle import parse_turtle

FORMAT_ALIASES = {
    "turtle": "turtle", "ttl": "turtle", "text/turtle": "turtle",
    "trig": "trig", "application/trig": "trig",
    "ntriples": "ntriples", "nt": "ntriples",
    "application/n-triples": "ntriples",
    "nquads": "nquads", "nq": "nquads", "application/n-quads": "nquads",
    "rdfxml": "rdfxml", "rdf": "rdfxml", "xml": "rdfxml",
    "application/rdf+xml": "rdfxml",
    "jsonld": "jsonld", "json-ld": "jsonld", "json": "jsonld",
    "application/ld+json": "jsonld",
    # full-processor JSON-LD (expansion algorithm + spec numerics)
    "jsonld11": "jsonld11", "jsonld-full": "jsonld11",
}


def parse_format(name: str) -> Optional[str]:
    """Alias normalization (rdf/format.go:26-46)."""
    return FORMAT_ALIASES.get(name.strip().lower())


_NQ_LINE = re.compile(
    r"^\s*(<[^>]*>|_:\S+)\s+<[^>]*>\s+(<[^>]*>|_:\S+|\"[^\"]*\"(\^\^<[^>]*>|@[\w-]+)?)\s+(<[^>]*>|_:\S+)\s*\.")


def detect_format(sample: str) -> Optional[str]:
    """Best-effort format sniff over the first 512 chars."""
    sample = sample[:512].strip()
    if not sample:
        return None
    if sample[0] in "{[":
        return "jsonld"
    if sample.startswith("<?xml") or sample.startswith("<rdf:") or \
            sample.startswith("<rdf ") or "<rdf:RDF" in sample:
        return "rdfxml"
    upper = sample.upper()
    lines = [ln.strip() for ln in sample.splitlines()
             if ln.strip() and not ln.strip().startswith("#")]
    first = lines[0] if lines else ""
    if first.upper().startswith(("@PREFIX", "PREFIX", "@BASE", "BASE",
                                 "@VERSION", "VERSION")):
        body = "\n".join(lines)
        if re.search(r"\{", body) and not re.search(r"\{\|", body):
            return "trig"
        return "turtle"
    # plain statement lines
    if first.startswith("<") or first.startswith("_:"):
        if _NQ_LINE.match(first):
            return "nquads"
        if re.match(r"^\s*(<[^>]*>|_:\S+)\s+<", first) and \
                "[" not in first and "(" not in first:
            # graph-brace statement → TriG
            if "{" in first and "{|" not in first:
                return "trig"
            return "ntriples"
        return "turtle"
    if "{" in sample and ":" in sample:
        return "trig"
    if ":" in sample:
        return "turtle"
    return None


PARSERS: Dict[str, Callable] = {
    "turtle": lambda text, base, bnf: parse_turtle(text, base=base, bnode_factory=bnf),
    "trig": lambda text, base, bnf: parse_trig(text, base=base, bnode_factory=bnf),
    "ntriples": lambda text, base, bnf: parse_nt_document(text, quads=False),
    "nquads": lambda text, base, bnf: parse_nt_document(text, quads=True),
    "rdfxml": lambda text, base, bnf: parse_rdfxml(text, base=base, bnode_factory=bnf),
    "jsonld": lambda text, base, bnf: parse_jsonld(text, base=base, bnode_factory=bnf),
    "jsonld11": lambda text, base, bnf: __import__(
        "rdf_go_spark.parsers.jsonld_full", fromlist=["x"]).to_rdf(
            text, base=base),
}


def _relabel_term(term, mapper):
    if isinstance(term, BlankNode):
        return BlankNode(mapper(term.id))
    if isinstance(term, TripleTerm):
        return TripleTerm(_relabel_term(term.s, mapper), term.p,
                          _relabel_term(term.o, mapper))
    return term


def parse_any(text: str, fmt: Optional[str] = None, base: str = "",
              bnode_factory: Optional[Callable[[], BlankNode]] = None
              ) -> Tuple[List[Quad], List[ParseError], str]:
    """Parse with explicit or auto-detected format.

    Returns (statements, errors, format_used).

    When ``bnode_factory`` is given, EVERY blank node — labeled (_:b0) and
    anonymous alike, in all six formats including N-Triples/N-Quads — is
    relabeled through a per-call label→factory map in statement order.
    Labeled bnodes would otherwise keep their document-local labels and
    silently merge distinct nodes when documents are unioned (the
    parse_rdf_documents skolemization contract).

    Anonymous nodes ([ … ], collections, JSON-LD node minting) are parsed
    with an internal factory whose ids start with ``\\x00`` — a byte no
    bnode-label grammar admits — so a document label like ``_:b1`` can
    never collide with a generated anonymous id before relabeling."""
    if fmt:
        canon = parse_format(fmt)
        if canon is None:
            return [], [ParseError(f"unknown format {fmt!r}",
                                   code="ERR_FORMAT")], ""
    else:
        canon = detect_format(text)
        if canon is None:
            return [], [ParseError("cannot detect format",
                                   code="ERR_FORMAT")], ""
    anon_factory = None
    if bnode_factory is not None:
        anon_counter = [0]

        def anon_factory():  # ids outside every label grammar (\x00 prefix)
            anon_counter[0] += 1
            return BlankNode(f"\x00anon{anon_counter[0]}")

    stmts, errs = PARSERS[canon](text, base, anon_factory)
    if bnode_factory is not None:
        label_map: Dict[str, str] = {}

        def mapper(lbl: str) -> str:
            if lbl not in label_map:
                label_map[lbl] = bnode_factory().id
            return label_map[lbl]

        stmts = [Quad(_relabel_term(q.s, mapper), q.p,
                      _relabel_term(q.o, mapper),
                      None if q.g is None else _relabel_term(q.g, mapper))
                 for q in stmts]
    return stmts, errs, canon
