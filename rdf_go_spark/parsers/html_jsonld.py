"""JSON-LD extraction from HTML script elements (JSON-LD 1.1 API,
"HTML Content Algorithms"): find ``<script type="application/ld+json">``
elements, honoring fragment targeting, the ``extractAllScripts`` option,
comment-wrapped script text, and the ``<base href>`` element.

This surface EXCEEDS the reference: its W3C report skips every HtmlTest
("HTML Script Extraction" processor feature, 20 skips in w3c-report.txt)
while this module passes the full html-manifest suite
(tests/test_jsonld_html.py).

HTML parsing uses the stdlib ``html.parser`` — script/style content is
CDATA, so character references inside JSON-LD scripts stay UNdecoded,
exactly as the fixtures require (html/e010: ``&lt;&amp;&gt;`` survives
literally).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser
from typing import List, Optional, Tuple

from ..terms import ParseError, resolve_iri

LD_JSON = "application/ld+json"


class _Collector(HTMLParser):
    """Collects every element id (for fragment targeting), all script
    elements in document order, and the first <base href>."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.scripts: List[dict] = []  # {id, type, text}
        self.ids: dict = {}            # id -> tag name
        self.base_href: Optional[str] = None
        self._open_script: Optional[dict] = None

    def handle_starttag(self, tag, attrs):
        attrs = dict(attrs)
        el_id = attrs.get("id")
        if el_id is not None and el_id not in self.ids:
            self.ids[el_id] = tag
        if tag == "base" and self.base_href is None and "href" in attrs:
            self.base_href = attrs["href"]
        if tag == "script":
            self._open_script = {"id": el_id,
                                 "type": (attrs.get("type") or ""),
                                 "text": ""}
            self.scripts.append(self._open_script)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag == "script":
            self._open_script = None

    def handle_endtag(self, tag):
        if tag == "script":
            self._open_script = None

    def handle_data(self, data):
        if self._open_script is not None:
            self._open_script["text"] += data


def _is_ld_json(type_attr: str) -> bool:
    # media-type parameters (e.g. ";profile=...") are allowed
    return type_attr.split(";", 1)[0].strip().lower() == LD_JSON


def _parse_script_text(text: str):
    """Uncomment + JSON-parse one script element's content. Errors are
    "invalid script element" per the spec: a comment wrapper must be
    complete, and the uncommented text must contain no comment markers."""
    t = text.strip()
    if t.startswith("<!--"):
        if not t.endswith("-->"):
            raise ParseError("jsonld: invalid script element "
                             "(end comment missing)", code="ERR_SCRIPT")
        t = t[4:-3]
    if "<!--" in t or "-->" in t:
        raise ParseError("jsonld: invalid script element "
                         "(comment in script text)", code="ERR_SCRIPT")
    try:
        return json.loads(t)
    except ValueError as ex:
        raise ParseError(f"jsonld: invalid script element ({ex})",
                         code="ERR_SCRIPT") from ex


def extract_html_jsonld(html_text: str, fragment: Optional[str] = None,
                        extract_all_scripts: bool = False,
                        missing_ok: bool = False):
    """Extract the JSON-LD value(s) embedded in an HTML document.

    Returns (value, base_href). ``fragment`` targets one script by id;
    ``extract_all_scripts`` concatenates every ld+json script (a script
    whose value is an array contributes its items); otherwise the first
    ld+json script wins. A missing script is "loading document failed"
    unless ``extract_all_scripts`` (empty array) or ``missing_ok`` (the
    ToRDF pipeline shape: no scripts → empty dataset, html/r006)."""
    col = _Collector()
    col.feed(html_text)
    col.close()
    if fragment is not None:
        if fragment not in col.ids:
            raise ParseError(
                f"jsonld: loading document failed (no element #{fragment})",
                code="ERR_LOAD")
        target = next((s for s in col.scripts if s["id"] == fragment), None)
        if target is None:
            raise ParseError(
                f"jsonld: loading document failed (#{fragment} is a "
                f"{col.ids[fragment]}, not a script)", code="ERR_LOAD")
        if not _is_ld_json(target["type"]):
            raise ParseError(
                f"jsonld: loading document failed (#{fragment} has type "
                f"{target['type']!r})", code="ERR_LOAD")
        return _parse_script_text(target["text"]), col.base_href
    ld = [s for s in col.scripts if _is_ld_json(s["type"])]
    if extract_all_scripts:
        out: list = []
        for s in ld:
            v = _parse_script_text(s["text"])
            out.extend(v) if isinstance(v, list) else out.append(v)
        return out, col.base_href
    if not ld:
        if missing_ok:
            return [], col.base_href
        raise ParseError("jsonld: loading document failed "
                         "(no ld+json script element)", code="ERR_LOAD")
    return _parse_script_text(ld[0]["text"]), col.base_href


def load_html_document(html_text: str, base: str = "",
                       fragment: Optional[str] = None,
                       extract_all_scripts: bool = False,
                       missing_ok: bool = False) -> Tuple[object, str]:
    """Full document-load shape: extract the JSON value AND compute the
    effective base — ``<base href>`` resolved against the document /
    option base (html/e020-e022)."""
    doc, base_href = extract_html_jsonld(
        html_text, fragment=fragment,
        extract_all_scripts=extract_all_scripts, missing_ok=missing_ok)
    eff_base = resolve_iri(base, base_href) if base_href else base
    return doc, eff_base
