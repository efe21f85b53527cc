"""JSON-LD streaming-subset decoder.

Parity target: the reference's streaming decoder (rdf/jsonld.go:322-775),
NOT its full json-gold-backed processor (rdf/jsonld_api.go — expansion,
remote contexts, framing are out of scope there too for the hot path).

Supported subset (same as reference):
- inline ``@context``: prefix/term → IRI string mappings and ``@vocab``
  (rdf/jsonld.go:570-598); context arrays merge; remote context URLs ignored
- ``@id`` (required per node — rdf/jsonld.go:714-729), ``@type`` (string or
  array), ``@graph`` (named when the node has a subject, incl. buffering a
  top-level @graph seen before @context), ``@value``/@language``/``@type``
  value objects, ``@list`` → rdf:first/rest/nil chains
- native JSON number → **xsd:decimal** and bool → xsd:boolean — a
  reference-specific quirk (standard JSON-LD uses xsd:double for
  non-integers) that we reproduce (rdf/jsonld_helpers.go:10-21)
- term expansion: prefix match before ``@vocab`` before base resolution
  (rdf/jsonld.go:693-708)

The Go goroutine+channel shell (rdf/jsonld.go:24-150) disappears: Spark task
parallelism replaces it (one document per mapInPandas row).
"""

from __future__ import annotations

import json
from typing import Callable, List, Optional, Tuple

from ..terms import (
    BlankNode, IRI, Literal, ParseError, Quad, Term,
    RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD_BOOLEAN, XSD_DECIMAL,
    resolve_iri,
)


class _Context:
    __slots__ = ("prefixes", "vocab", "base", "coercions", "containers")

    def __init__(self, base: str = ""):
        self.prefixes: dict[str, str] = {}
        self.vocab = ""
        self.base = base
        self.coercions: dict[str, str] = {}   # term -> @type coercion
        self.containers: dict[str, str] = {}  # term -> @container

    def child(self) -> "_Context":
        c = _Context(self.base)
        c.prefixes = dict(self.prefixes)
        c.vocab = self.vocab
        c.coercions = dict(self.coercions)
        c.containers = dict(self.containers)
        return c

    def with_context(self, raw) -> "_Context":
        if raw is None:
            return self
        c = self.child()
        if isinstance(raw, dict):
            for key, value in raw.items():
                if key == "@vocab":
                    if isinstance(value, str):
                        c.vocab = value
                elif key == "@base":
                    if isinstance(value, str):
                        c.base = value
                elif isinstance(value, str):
                    c.prefixes[key] = value
                elif isinstance(value, dict):
                    if isinstance(value.get("@id"), str):
                        c.prefixes[key] = value["@id"]
                    if isinstance(value.get("@type"), str):
                        c.coercions[key] = value["@type"]
                    if isinstance(value.get("@container"), str):
                        c.containers[key] = value["@container"]
            return c
        if isinstance(raw, list):
            for item in raw:
                c = c.with_context(item)
            return c
        return c  # remote context URL: unsupported in streaming subset

    def expand(self, value: str, _depth: int = 0) -> str:
        # exact term definition first (spec-correct superset of the
        # reference's prefix-only lookup); term values may themselves be
        # compact IRIs (w3c toRdf e070) — expand recursively, guarding
        # self-referential definitions like "prefix:foo": "prefix:foo"
        if _depth < 5:
            ns = self.prefixes.get(value)
            if ns is not None and ns != value and ":" in ns:
                return self.expand(ns, _depth + 1)
        if ":" in value:
            prefix, rest = value.split(":", 1)
            ns = self.prefixes.get(prefix)
            if ns is not None:
                return ns + rest
            return value
        if self.vocab:
            return self.vocab + value
        if self.base:
            return resolve_iri(self.base, value)
        return value

    def expand_id(self, value: str, _depth: int = 0) -> str:
        """@id / node-reference expansion: document-relative (base), never
        @vocab (JSON-LD 1.1 §IRI expansion with document-relative=true)."""
        if _depth < 5:
            ns = self.prefixes.get(value)
            if ns is not None and ns != value and ":" in ns:
                return self.expand_id(ns, _depth + 1)
        if ":" in value:
            prefix, rest = value.split(":", 1)
            ns = self.prefixes.get(prefix)
            if ns is not None:
                return ns + rest
            return value
        if self.base:
            return resolve_iri(self.base, value)
        return value


class JsonLdDecoder:
    def __init__(self, base: str = "",
                 bnode_factory: Optional[Callable[[], BlankNode]] = None,
                 max_nodes: int = 0, max_depth: int = 100,
                 strict_ids: bool = False):
        # strict_ids=True reproduces the reference streaming decoder's
        # node-missing-@id error (rdf/jsonld.go:714-729); the default
        # follows the JSON-LD spec and mints a fresh blank node
        self.strict_ids = strict_ids
        self.base = base
        self.max_nodes = max_nodes
        self.max_depth = max_depth
        self.node_count = 0
        self.quads: List[Quad] = []
        if bnode_factory is None:
            counter = [0]

            def factory():
                counter[0] += 1
                return BlankNode(f"b{counter[0]}")
            bnode_factory = factory
        self.new_bnode = bnode_factory

    def parse(self, text: str) -> List[Quad]:
        try:
            doc = json.loads(text)
        except json.JSONDecodeError as e:
            raise ParseError(f"invalid JSON: {e}", line=e.lineno, col=e.colno)
        ctx = _Context(self.base)
        if isinstance(doc, list):
            for item in doc:
                if isinstance(item, dict):
                    node_ctx = ctx.with_context(item.get("@context"))
                    self.parse_node(item, node_ctx, None, 0)
            return self.quads
        if not isinstance(doc, dict):
            raise ParseError("jsonld: top-level value must be object or array")
        ctx = ctx.with_context(doc.get("@context"))
        if "@graph" in doc and "@id" not in doc:
            # top-level @graph with no @id → default graph
            self.parse_graph(doc["@graph"], ctx, None, 0)
            rest = {k: v for k, v in doc.items() if k != "@graph"}
            if any(k != "@context" for k in rest):
                self.parse_node(rest, ctx, None, 0)
        else:
            # @id + @graph → named graph (handled inside parse_node)
            self.parse_node(doc, ctx, None, 0)
        return self.quads

    def _bump(self) -> None:
        self.node_count += 1
        if self.max_nodes and self.node_count > self.max_nodes:
            raise ParseError("jsonld: node limit exceeded", code="ERR_LIMIT")

    def parse_graph(self, graph, ctx: _Context, graph_name: Optional[Term],
                    depth: int) -> None:
        if isinstance(graph, list):
            for node in graph:
                if isinstance(node, dict):
                    self.parse_node(node, ctx, graph_name, depth)
        elif isinstance(graph, dict):
            self.parse_node(graph, ctx, graph_name, depth)

    def parse_node(self, node: dict, ctx: _Context,
                   graph_name: Optional[Term], depth: int) -> None:
        if depth >= self.max_depth:
            raise ParseError("jsonld: max depth exceeded", code="ERR_DEPTH")
        self._bump()
        ctx = ctx.with_context(node.get("@context"))
        subject = self.subject_term(node.get("@id"), ctx)
        for key, raw in node.items():
            if key.startswith("@"):
                continue
            pred_iri = ctx.expand(key)
            if not pred_iri:
                raise ParseError(f"jsonld: cannot resolve predicate {key!r}")
            self.emit_value(subject, IRI(pred_iri), raw, ctx, graph_name,
                            depth, term=key)
        raw_types = node.get("@type")
        if raw_types is not None:
            types = raw_types if isinstance(raw_types, list) else [raw_types]
            for t in types:
                if isinstance(t, str):
                    self.quads.append(Quad(subject, IRI(RDF_TYPE),
                                           IRI(ctx.expand(t)), graph_name))
        if "@graph" in node:
            self.parse_graph(node["@graph"], ctx, subject, depth + 1)
        return subject

    def subject_term(self, raw, ctx: _Context) -> Term:
        if raw is None:
            if self.strict_ids:
                raise ParseError("jsonld: node missing @id")
            return self.new_bnode()
        if not isinstance(raw, str):
            raise ParseError(f"jsonld: node @id must be string, got {type(raw).__name__}")
        if raw.startswith("_:"):
            return BlankNode(raw[2:])
        expanded = ctx.expand_id(raw)
        if not expanded:
            raise ParseError(f"jsonld: node missing @id (failed to expand {raw!r})")
        return IRI(expanded)

    def object_from_id(self, id_value: str, ctx: _Context) -> Term:
        if id_value.startswith("_:"):
            return BlankNode(id_value[2:])
        return IRI(ctx.expand_id(id_value))

    @staticmethod
    def literal_value(value) -> Literal:
        if isinstance(value, bool):
            return Literal("true" if value else "false", datatype=XSD_BOOLEAN)
        if isinstance(value, (int, float)):
            lex = str(value)
            # Go renders float64 via %v: integral floats print without ".0"
            if isinstance(value, float) and value.is_integer():
                lex = str(int(value))
            return Literal(lex, datatype=XSD_DECIMAL)
        return Literal(str(value))

    def emit_value(self, subject: Term, pred: IRI, raw, ctx: _Context,
                   graph_name: Optional[Term], depth: int,
                   term: str = "") -> None:
        if depth >= self.max_depth:
            raise ParseError("jsonld: max depth exceeded", code="ERR_DEPTH")
        if raw is None:
            return  # null values are ignored (JSON-LD expansion)
        container = ctx.containers.get(term, "")
        if isinstance(raw, list):
            if container == "@list":
                head = self.emit_list(raw, ctx, graph_name, depth)
                self.quads.append(Quad(subject, pred, head, graph_name))
                return
            for item in raw:
                self.emit_value(subject, pred, item, ctx, graph_name,
                                depth + 1, term=term)
            return
        if isinstance(raw, dict):
            if "@set" in raw:
                self.emit_value(subject, pred, raw["@set"], ctx, graph_name,
                                depth + 1, term=term)
                return
            self.emit_object_value(subject, pred, raw, ctx, graph_name, depth)
            return
        if isinstance(raw, str):
            coercion = ctx.coercions.get(term, "")
            if coercion == "@id" or coercion == "@vocab":
                obj = (IRI(ctx.expand(raw)) if coercion == "@vocab"
                       else self.object_from_id(raw, ctx))
                self.quads.append(Quad(subject, pred, obj, graph_name))
                return
            if coercion and not coercion.startswith("@"):
                self.quads.append(
                    Quad(subject, pred,
                         Literal(raw, datatype=ctx.expand(coercion)),
                         graph_name))
                return
            self.quads.append(Quad(subject, pred, Literal(raw), graph_name))
            return
        if isinstance(raw, (bool, int, float)):
            self.quads.append(
                Quad(subject, pred, self.literal_value(raw), graph_name))
            return
        raise ParseError(f"jsonld: unsupported literal value ({type(raw).__name__})")

    def emit_object_value(self, subject: Term, pred: IRI, value: dict,
                          ctx: _Context, graph_name: Optional[Term],
                          depth: int) -> None:
        id_value = value.get("@id")
        node_keys = [k for k in value
                     if k not in ("@id", "@context", "@index") and
                     not (k == "@type" and False)]
        is_node_object = any(not k.startswith("@") or k in ("@type", "@graph")
                             for k in value) and "@value" not in value             and "@list" not in value
        if isinstance(id_value, str) and not is_node_object:
            self.quads.append(
                Quad(subject, pred, self.object_from_id(id_value, ctx),
                     graph_name))
            return
        if is_node_object or (id_value is None and "@value" not in value
                              and "@list" not in value and "@set" not in value):
            # nested node object: recurse, link to its subject
            child = self.parse_node(value, ctx, graph_name, depth + 1)
            self.quads.append(Quad(subject, pred, child, graph_name))
            return
        if "@value" in value:
            if value["@value"] is None:
                return
            lit = self.literal_value(value["@value"])
            lang = value.get("@language")
            dtype = value.get("@type")
            if isinstance(lang, str):
                lit = Literal(lit.lexical, lang=lang)
            elif isinstance(dtype, str):
                lit = Literal(lit.lexical, datatype=ctx.expand(dtype))
            self.quads.append(Quad(subject, pred, lit, graph_name))
            return
        if "@list" in value:
            head = self.emit_list(value["@list"], ctx, graph_name, depth)
            self.quads.append(Quad(subject, pred, head, graph_name))
            return
        raise ParseError("jsonld: unsupported object value")

    def emit_list(self, raw, ctx: _Context, graph_name: Optional[Term],
                  depth: int) -> Term:
        if not isinstance(raw, list):
            raise ParseError("jsonld: invalid @list value")
        if not raw:
            return IRI(RDF_NIL)
        head = self.new_bnode()
        current = head
        for i, item in enumerate(raw):
            obj = self.value_term(item, ctx, graph_name, depth)
            self.quads.append(Quad(current, IRI(RDF_FIRST), obj, graph_name))
            if i == len(raw) - 1:
                self.quads.append(
                    Quad(current, IRI(RDF_REST), IRI(RDF_NIL), graph_name))
            else:
                nxt = self.new_bnode()
                self.quads.append(Quad(current, IRI(RDF_REST), nxt, graph_name))
                current = nxt
        return head

    def value_term(self, raw, ctx: _Context, graph_name: Optional[Term],
                   depth: int) -> Term:
        if isinstance(raw, dict):
            if isinstance(raw.get("@id"), str):
                return self.object_from_id(raw["@id"], ctx)
            if "@value" in raw:
                lit = self.literal_value(raw["@value"])
                lang = raw.get("@language")
                dtype = raw.get("@type")
                if isinstance(lang, str):
                    return Literal(lit.lexical, lang=lang)
                if isinstance(dtype, str):
                    return Literal(lit.lexical, datatype=ctx.expand(dtype))
                return lit
            if "@list" in raw:
                return self.emit_list(raw["@list"], ctx, graph_name, depth + 1)
            raise ParseError("jsonld: unsupported list item")
        if isinstance(raw, (str, bool, int, float)):
            return self.literal_value(raw) if not isinstance(raw, str) \
                else Literal(raw)
        raise ParseError("jsonld: unsupported list item")


def parse_jsonld(text: str, base: str = "",
                 bnode_factory: Optional[Callable[[], BlankNode]] = None
                 ) -> Tuple[List[Quad], List[ParseError]]:
    dec = JsonLdDecoder(base=base, bnode_factory=bnode_factory)
    try:
        return dec.parse(text), []
    except ParseError as e:
        return dec.quads, [e]
    except RecursionError:
        return dec.quads, [ParseError("max depth exceeded", code="ERR_DEPTH")]
