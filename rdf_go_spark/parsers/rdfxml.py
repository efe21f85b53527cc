"""RDF/XML parser over a namespace-preserving expat tree (xmltree.py).

From-scratch implementation of the RDF/XML syntax spec plus the RDF 1.2
annotation extension, behavior-matched to the reference decoder
(rdf/rdfxml.go:58-937) and validated against the W3C rdfxml corpus
(~200 inputs, 160 expected .nt evals):

- node elements: rdf:Description / typed nodes (type triple,
  rdf/rdfxml.go:146-153); rdf:about / rdf:ID (base + '#' + id, duplicate-ID
  error, rdf/rdfxml.go:863-869,686-728) / rdf:nodeID / fresh bnode
- property elements: rdf:resource, rdf:nodeID, rdf:datatype, nested node
  elements, property attributes, rdf:li → rdf:_1, rdf:_2 … counters per
  container (rdf/rdfxml_helpers.go:89-111)
- parseType Resource / Literal (rdf:XMLLiteral) / Collection / Triple
- reification via property rdf:ID (classic rdf:Statement quad) and RDF 1.2
  rdf:annotation / rdf:annotationNodeID → rdf:reifies triple terms
  (rdf/rdfxml.go:625-653)
- xml:base stack with RFC 3986 resolution, xml:lang inheritance
- obsolete rdf:aboutEach / rdf:aboutEachPrefix / rdf:bagID rejected
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Tuple

from .xmltree import XElem, XmlError, parse_xml, serialize_xml_literal

from ..terms import (
    BlankNode, IRI, Literal, ParseError, Quad, Term, TripleTerm,
    RDF_FIRST, RDF_NIL, RDF_NS, RDF_REIFIES, RDF_REST, RDF_TYPE,
    RDF_XMLLITERAL, is_valid_lang_tag, resolve_iri,
)

XML_NS = "http://www.w3.org/XML/1998/namespace"
ITS_NS = "http://www.w3.org/2005/11/its"
_RDF = "{" + RDF_NS + "}"
_XML_BASE = "{" + XML_NS + "}base"
_XML_LANG = "{" + XML_NS + "}lang"

_SYNTAX_ATTRS = {_RDF + a for a in
                 ("about", "ID", "nodeID", "resource", "datatype",
                  "parseType", "annotation", "annotationNodeID", "version")}
_ITS_ATTRS = {"{" + ITS_NS + "}dir", "{" + ITS_NS + "}version"}
_SYNTAX_ATTRS |= _ITS_ATTRS
_OLD_TERMS = {_RDF + a for a in ("aboutEach", "aboutEachPrefix", "bagID")}
_FORBIDDEN_NODE_TAGS = {_RDF + a for a in
                        ("RDF", "ID", "about", "parseType", "resource",
                         "nodeID", "datatype", "li", "aboutEach",
                         "aboutEachPrefix", "bagID")}
_FORBIDDEN_PROP_TAGS = {_RDF + a for a in
                        ("RDF", "ID", "about", "parseType", "resource",
                         "nodeID", "datatype", "Description", "aboutEach",
                         "aboutEachPrefix", "bagID")}
_NODEID_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\--￿]*$")


def _split_tag(tag: str) -> Tuple[str, str]:
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns, local
    return "", tag


class RdfXmlParser:
    def __init__(self, base: str = "",
                 bnode_factory: Optional[Callable[[], BlankNode]] = None):
        self.quads: List[Quad] = []
        self.ids_seen: set = set()
        self.li_counters: dict = {}
        if bnode_factory is None:
            counter = [0]

            def factory():
                counter[0] += 1
                return BlankNode(f"b{counter[0]}")
            bnode_factory = factory
        self.new_bnode = bnode_factory
        self.initial_base = base

    def emit(self, s: Term, p: IRI, o: Term) -> None:
        self.quads.append(Quad(s, p, o, None))

    def parse(self, text: str) -> List[Quad]:
        try:
            root = parse_xml(text)
        except XmlError as e:
            raise ParseError(f"invalid XML: {e}")
        base = self._child_base(root, self.initial_base)
        lang = root.get(_XML_LANG, "")
        direction = root.get("{" + ITS_NS + "}dir", "")
        # RDF 1.2 features (triple terms, text direction) are gated on a
        # scoped rdf:version="1.2" (w3c rdf12-xml-tt-01 vs tt-02,
        # dir-02 vs dir-05)
        version = root.get(_RDF + "version", "")
        if root.tag == _RDF + "RDF":
            for child in root:
                self.parse_node_element(child, base, lang, direction, version)
            if root.all_text().strip():
                raise ParseError("unexpected text content in rdf:RDF")
        else:
            self.parse_node_element(root, base, lang, direction, version)
        return self.quads

    def _child_base(self, elem, base: str) -> str:
        xb = elem.get(_XML_BASE)
        if xb is not None:
            new = resolve_iri(base, xb) if base else xb
            # a base's fragment is dropped for resolution purposes
            if "#" in new:
                new = new.split("#", 1)[0]
            return new
        return base

    def _resolve(self, base: str, value: str) -> str:
        return resolve_iri(base, value) if base else value

    def _resolve_id(self, base: str, id_value: str) -> str:
        if not _NODEID_RE.match(id_value):
            raise ParseError(f"invalid rdf:ID {id_value!r}")
        iri = self._resolve(base, "#" + id_value)
        if iri in self.ids_seen:
            raise ParseError(f"duplicate rdf:ID {id_value!r}")
        self.ids_seen.add(iri)
        return iri

    # -- node elements -------------------------------------------------------

    def parse_node_element(self, elem, base: str, lang: str,
                           direction: str = "", version: str = "") -> Term:
        tag = elem.tag
        if tag in _FORBIDDEN_NODE_TAGS or tag in _OLD_TERMS:
            raise ParseError(f"forbidden node element {tag}")
        ns, local = _split_tag(tag)
        if not ns:
            raise ParseError(f"node element {local!r} has no namespace")
        base = self._child_base(elem, base)
        lang = elem.get(_XML_LANG, lang)
        direction = elem.get("{" + ITS_NS + "}dir", direction)
        version = elem.get(_RDF + "version", version)
        if lang and not is_valid_lang_tag(lang):
            raise ParseError(f"invalid xml:lang {lang!r}")

        about = elem.get(_RDF + "about")
        id_attr = elem.get(_RDF + "ID")
        node_id = elem.get(_RDF + "nodeID")
        if sum(x is not None for x in (about, id_attr, node_id)) > 1:
            raise ParseError("rdf:about, rdf:ID and rdf:nodeID are mutually exclusive")
        for a in elem.attrib:
            if a in _OLD_TERMS:
                raise ParseError(f"obsolete attribute {a}")
        if about is not None:
            subject: Term = IRI(self._resolve(base, about))
        elif id_attr is not None:
            subject = IRI(self._resolve_id(base, id_attr))
        elif node_id is not None:
            if not _NODEID_RE.match(node_id):
                raise ParseError(f"invalid rdf:nodeID {node_id!r}")
            subject = BlankNode(node_id)
        else:
            subject = self.new_bnode()

        if tag != _RDF + "Description":
            self.emit(subject, IRI(RDF_TYPE), IRI(ns + local))

        # property attributes on the node element
        self._emit_property_attrs(elem, subject, base, lang, direction, version)

        # property elements
        li = [0]
        for child in elem:
            self.parse_property_element(child, subject, base, lang, li,
                                        direction, version)
        return subject

    @staticmethod
    def _lang_tag(lang: str, direction: str, version: str) -> str:
        """RDF 1.2 initial text direction: lang + '--' + its:dir, only under
        a scoped rdf:version="1.2" (w3c rdf12-xml-dir-01..06)."""
        if version == "1.2" and lang and direction in ("ltr", "rtl"):
            return f"{lang}--{direction}"
        return lang

    def _emit_property_attrs(self, elem, subject: Term, base: str,
                             lang: str, direction: str = "",
                             version: str = "") -> None:
        for attr, value in elem.attrib.items():
            if attr in _SYNTAX_ATTRS or attr.startswith("{" + XML_NS + "}"):
                continue
            ans, alocal = _split_tag(attr)
            if not ans:
                continue  # unqualified attrs (xmlns handled by ET) ignored
            if attr == _RDF + "type":
                self.emit(subject, IRI(RDF_TYPE), IRI(self._resolve(base, value)))
                continue
            if attr == _RDF + "li" or attr in _FORBIDDEN_NODE_TAGS:
                raise ParseError(f"forbidden property attribute {attr}")
            self.emit(subject, IRI(ans + alocal),
                      Literal(value, lang=self._lang_tag(lang, direction,
                                                         version)))

    # -- property elements ---------------------------------------------------

    def _predicate(self, elem, subject: Term, li_counter) -> IRI:
        tag = elem.tag
        if tag in _FORBIDDEN_PROP_TAGS or tag in _OLD_TERMS:
            raise ParseError(f"forbidden property element {tag}")
        ns, local = _split_tag(tag)
        if not ns:
            raise ParseError(f"property element {local!r} has no namespace")
        if tag == _RDF + "li":
            li_counter[0] += 1
            return IRI(RDF_NS + f"_{li_counter[0]}")
        return IRI(ns + local)

    def parse_property_element(self, elem, subject: Term, base: str,
                               lang: str, li_counter,
                               direction: str = "", version: str = "") -> None:
        base = self._child_base(elem, base)
        lang = elem.get(_XML_LANG, lang)
        direction = elem.get("{" + ITS_NS + "}dir", direction)
        version = elem.get(_RDF + "version", version)
        if lang and not is_valid_lang_tag(lang):
            raise ParseError(f"invalid xml:lang {lang!r}")
        pred = self._predicate(elem, subject, li_counter)

        id_attr = elem.get(_RDF + "ID")
        resource = elem.get(_RDF + "resource")
        node_id = elem.get(_RDF + "nodeID")
        datatype = elem.get(_RDF + "datatype")
        parse_type = elem.get(_RDF + "parseType")
        annotation = elem.get(_RDF + "annotation")
        annotation_nid = elem.get(_RDF + "annotationNodeID")
        for a in elem.attrib:
            if a in _OLD_TERMS:
                raise ParseError(f"obsolete attribute {a}")
        if resource is not None and node_id is not None:
            raise ParseError("rdf:resource and rdf:nodeID are mutually exclusive")
        if annotation is not None and annotation_nid is not None:
            raise ParseError("rdf:annotation and rdf:annotationNodeID are mutually exclusive")

        obj: Optional[Term] = None

        prop_attrs = [a for a in elem.attrib
                      if a not in _SYNTAX_ATTRS and a != _RDF + "ID"
                      and not a.startswith("{" + XML_NS + "}")
                      and _split_tag(a)[0]]

        if parse_type is not None:
            if resource is not None or node_id is not None or datatype is not None:
                raise ParseError("parseType conflicts with resource/nodeID/datatype")
            if prop_attrs:
                # rdfms-empty-property-elements/error003
                raise ParseError("property attributes conflict with parseType")
            if parse_type == "Resource":
                obj = self.new_bnode()
                inner_li = [0]
                for child in elem:
                    self.parse_property_element(child, obj, base, lang,
                                                inner_li, direction, version)
            elif parse_type == "Collection":
                items = [self.parse_node_element(c, base, lang, direction,
                                                 version)
                         for c in elem]
                obj = self._emit_collection(items)
            elif parse_type == "Triple":
                children = elem.children()
                if len(children) != 1:
                    raise ParseError("parseType=Triple requires one node element")
                before = len(self.quads)
                self.parse_node_element(children[0], base, lang, direction,
                                        version)
                inner = self.quads[before:]
                if len(inner) != 1:
                    raise ParseError("parseType=Triple content must be one triple")
                del self.quads[before:]
                if version != "1.2":
                    # without rdf:version="1.2" the statement is ignored
                    # (w3c rdf12-xml-tt-01 "Ignored triple term")
                    return
                t = inner[0]
                obj = TripleTerm(t.s, t.p, t.o)
            else:
                # "Literal" and any unknown parseType → canonical XML literal
                obj = Literal(serialize_xml_literal(elem),
                              datatype=RDF_XMLLITERAL)
        elif resource is not None:
            obj = IRI(self._resolve(base, resource))
            self._prop_attr_object(elem, obj, base, lang, direction, version)
        elif node_id is not None:
            if not _NODEID_RE.match(node_id):
                raise ParseError(f"invalid rdf:nodeID {node_id!r}")
            obj = BlankNode(node_id)
            self._prop_attr_object(elem, obj, base, lang, direction, version)
        else:
            children = elem.children()
            if children:
                if elem.all_text().strip():
                    raise ParseError("text and element content mixed in property")
                if len(children) > 1:
                    raise ParseError("multiple node elements in property")
                obj = self.parse_node_element(children[0], base, lang,
                                              direction, version)
            elif prop_attrs:
                if elem.all_text().strip():
                    raise ParseError("text content with property attributes")
                obj = self.new_bnode()
                self._prop_attr_object(elem, obj, base, lang, direction,
                                       version)
            else:
                text = elem.all_text()
                if datatype is not None:
                    obj = Literal(text, datatype=self._resolve(base, datatype))
                else:
                    obj = Literal(text, lang=self._lang_tag(lang, direction,
                                                            version))

        self.emit(subject, pred, obj)

        if id_attr is not None:
            # classic reification (RDF/XML syntax spec §7.3)
            stmt = IRI(self._resolve_id(base, id_attr))
            self.emit(stmt, IRI(RDF_TYPE), IRI(RDF_NS + "Statement"))
            self.emit(stmt, IRI(RDF_NS + "subject"), subject)
            self.emit(stmt, IRI(RDF_NS + "predicate"), pred)
            self.emit(stmt, IRI(RDF_NS + "object"), obj)
        if annotation is not None:
            self.emit(IRI(self._resolve(base, annotation)), IRI(RDF_REIFIES),
                      TripleTerm(subject, pred, obj))
        elif annotation_nid is not None:
            if not _NODEID_RE.match(annotation_nid):
                raise ParseError(f"invalid rdf:annotationNodeID {annotation_nid!r}")
            self.emit(BlankNode(annotation_nid), IRI(RDF_REIFIES),
                      TripleTerm(subject, pred, obj))

    def _prop_attr_object(self, elem, obj: Term, base: str, lang: str,
                          direction: str = "", version: str = "") -> None:
        """Property attributes on an empty property element describe the
        object node."""
        for attr, value in elem.attrib.items():
            if attr in _SYNTAX_ATTRS or attr == _RDF + "ID" or \
                    attr.startswith("{" + XML_NS + "}"):
                continue
            ans, alocal = _split_tag(attr)
            if not ans:
                continue
            if attr == _RDF + "type":
                self.emit(obj, IRI(RDF_TYPE), IRI(self._resolve(base, value)))
            else:
                self.emit(obj, IRI(ans + alocal),
                          Literal(value,
                                  lang=self._lang_tag(lang, direction,
                                                      version)))

    def _emit_collection(self, items: List[Term]) -> Term:
        if not items:
            return IRI(RDF_NIL)
        head = self.new_bnode()
        node = head
        for i, item in enumerate(items):
            self.emit(node, IRI(RDF_FIRST), item)
            if i + 1 < len(items):
                nxt = self.new_bnode()
                self.emit(node, IRI(RDF_REST), nxt)
                node = nxt
            else:
                self.emit(node, IRI(RDF_REST), IRI(RDF_NIL))
        return head


def parse_rdfxml(text: str, base: str = "",
                 bnode_factory: Optional[Callable[[], BlankNode]] = None
                 ) -> Tuple[List[Quad], List[ParseError]]:
    parser = RdfXmlParser(base=base, bnode_factory=bnode_factory)
    try:
        return parser.parse(text), []
    except ParseError as e:
        return parser.quads, [e]
    except RecursionError:
        return parser.quads, [ParseError("max depth exceeded", code="ERR_DEPTH")]
