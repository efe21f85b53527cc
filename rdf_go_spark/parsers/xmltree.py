"""Minimal namespace-aware XML tree built on expat, preserving what
ElementTree discards and RDF/XML conformance needs:

- original element/attribute prefixes (for XMLLiteral re-serialization)
- in-scope namespace declarations per element (inclusive-c14n ns axis)
- mixed-content ordering (text runs interleaved with child elements)

Plus an inclusive-canonical serializer for rdf:XMLLiteral content
(golden: w3c-tests/rdfxml/xml-canon/test001, rdfms-xml-literal-namespaces).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union
from xml.parsers import expat

SEP = "\x01"


class XElem:
    __slots__ = ("uri", "local", "prefix", "attrs", "ns_scope", "content",
                 "parent")

    def __init__(self, uri: str, local: str, prefix: str,
                 attrs: Dict[str, str], ns_scope: Dict[str, str],
                 parent: Optional["XElem"]):
        self.uri = uri
        self.local = local
        self.prefix = prefix
        # attrs keyed "{uri}local" → (value, prefix, local)
        self.attrs = attrs
        self.ns_scope = ns_scope  # prefix ("" = default) → uri, in scope
        self.content: List[Union[str, "XElem"]] = []  # mixed, in order
        self.parent = parent

    # -- ElementTree-ish facade ------------------------------------------

    @property
    def tag(self) -> str:
        return f"{{{self.uri}}}{self.local}" if self.uri else self.local

    @property
    def attrib(self) -> Dict[str, str]:
        return {k: v[0] for k, v in self.attrs.items()}

    def get(self, key: str, default=None):
        v = self.attrs.get(key)
        return v[0] if v is not None else default

    def __iter__(self):
        return iter([c for c in self.content if isinstance(c, XElem)])

    def children(self) -> List["XElem"]:
        return [c for c in self.content if isinstance(c, XElem)]

    def all_text(self) -> str:
        return "".join(c for c in self.content if isinstance(c, str))


class XmlError(ValueError):
    pass


def parse_xml(text: str) -> XElem:
    parser = expat.ParserCreate(namespace_separator=SEP)
    parser.namespace_prefixes = True
    parser.ordered_attributes = True

    root: List[Optional[XElem]] = [None]
    stack: List[XElem] = []
    pending_ns: List[Tuple[str, str]] = []

    def split_name(name: str) -> Tuple[str, str, str]:
        parts = name.split(SEP)
        if len(parts) == 3:
            return parts[0], parts[1], parts[2]
        if len(parts) == 2:
            return parts[0], parts[1], ""
        return "", parts[0], ""

    def start_ns(prefix, uri):
        pending_ns.append((prefix or "", uri or ""))

    def start(name, attr_list):
        nonlocal pending_ns
        uri, local, prefix = split_name(name)
        parent = stack[-1] if stack else None
        scope = dict(parent.ns_scope) if parent else {}
        for p, u in pending_ns:
            scope[p] = u
        pending_ns = []
        attrs: Dict[str, str] = {}
        for i in range(0, len(attr_list), 2):
            auri, alocal, aprefix = split_name(attr_list[i])
            key = f"{{{auri}}}{alocal}" if auri else alocal
            attrs[key] = (attr_list[i + 1], aprefix, alocal)
        elem = XElem(uri, local, prefix, attrs, scope, parent)
        if parent is not None:
            parent.content.append(elem)
        else:
            if root[0] is not None:
                raise XmlError("multiple root elements")
            root[0] = elem
        stack.append(elem)

    def end(name):
        stack.pop()

    def chars(data):
        if stack:
            stack[-1].content.append(data)

    parser.StartNamespaceDeclHandler = start_ns
    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chars

    try:
        parser.Parse(text, True)
    except expat.ExpatError as e:
        raise XmlError(str(e))
    if root[0] is None:
        raise XmlError("no root element")
    return root[0]


# ---------------------------------------------------------------------------
# Inclusive canonical serialization for rdf:XMLLiteral content
# ---------------------------------------------------------------------------

def _c14n_text(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace("\r", "&#xD;"))


def _c14n_attr(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace('"', "&quot;").replace("\t", "&#x9;")
            .replace("\n", "&#xA;").replace("\r", "&#xD;"))


def _qname(prefix: str, local: str) -> str:
    return f"{prefix}:{local}" if prefix else local


def _serialize_elem(elem: XElem, rendered_ns: Dict[str, str]) -> str:
    out = ["<", _qname(elem.prefix, elem.local)]
    # namespace axis: all in-scope namespaces not already rendered
    ns_items = []
    for prefix, uri in elem.ns_scope.items():
        if prefix == "xml":
            continue
        if rendered_ns.get(prefix) != uri:
            ns_items.append((prefix, uri))
    # document declaration order (outermost first), matching the W3C
    # rdfxml xml-canon expected outputs
    for prefix, uri in ns_items:
        decl = f'xmlns:{prefix}' if prefix else "xmlns"
        out.append(f' {decl}="{_c14n_attr(uri)}"')
    new_rendered = dict(rendered_ns)
    for prefix, uri in ns_items:
        new_rendered[prefix] = uri
    # attributes sorted by (namespace uri, local name)
    attr_entries = []
    for key, (value, aprefix, alocal) in elem.attrs.items():
        auri = key[1:].split("}", 1)[0] if key.startswith("{") else ""
        attr_entries.append((auri, alocal, aprefix, value))
    for auri, alocal, aprefix, value in sorted(attr_entries):
        out.append(f' {_qname(aprefix, alocal)}="{_c14n_attr(value)}"')
    out.append(">")
    for c in elem.content:
        if isinstance(c, str):
            out.append(_c14n_text(c))
        else:
            out.append(_serialize_elem(c, new_rendered))
    out.append(f"</{_qname(elem.prefix, elem.local)}>")
    return "".join(out)


def serialize_xml_literal(parent: XElem) -> str:
    """Canonical form of a property element's content for rdf:XMLLiteral."""
    out = []
    for c in parent.content:
        if isinstance(c, str):
            out.append(_c14n_text(c))
        else:
            out.append(_serialize_elem(c, {"xml": ""}))
    return "".join(out)
