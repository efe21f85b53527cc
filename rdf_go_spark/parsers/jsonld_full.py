"""JSON-LD full processor: expansion + deserialization to RDF.

The reference exposes this as JSONLDProcessor backed by json-gold
(rdf/jsonld_api.go:73-181); here it is a native implementation of the
JSON-LD 1.1 expansion algorithm core and the "Deserialize JSON-LD to RDF"
algorithm — including the SPEC numeric canonicalization (integer →
xsd:integer, fraction/exponent → xsd:double with canonical "1.5E0"
lexical form). This deliberately differs from the streaming decoder
(parsers/jsonld.py), which preserves the reference's native-number →
xsd:decimal quirk; the two coexist exactly as the reference's two APIs do.

Out of scope (as for the reference without a DocumentLoader): remote
contexts, framing, compaction.
"""

from __future__ import annotations

import json
import math
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

from ..terms import (
    BlankNode, IRI, Literal, ParseError, Quad, Term,
    RDF_FIRST, RDF_NIL, RDF_NS, RDF_REST, RDF_TYPE, XSD_BOOLEAN, XSD_DOUBLE,
    XSD_INTEGER, XSD_STRING, has_scheme, resolve_iri,
)

KEYWORDS = {
    "@base", "@container", "@context", "@direction", "@graph", "@id",
    "@import", "@included", "@index", "@json", "@language", "@list",
    "@nest", "@none", "@prefix", "@propagate", "@protected", "@reverse",
    "@set", "@type", "@value", "@version", "@vocab",
}

_KW_RE = re.compile(r"^@[A-Za-z]+$")

# sentinel: term has NO scoped context (None means an explicit
# "@context": null, which nullifies the active context — w3c pr06)
_NO_CTX = object()


class _TermDef:
    __slots__ = ("iri", "type_mapping", "container", "language", "reverse",
                 "prefix_flag", "local_ctx", "index_prop", "direction",
                 "nest", "protected")


    def __init__(self, iri, type_mapping=None, container=None, language=None,
                 reverse=False, prefix_flag=False, local_ctx=_NO_CTX,
                 index_prop=None, direction=None, nest=None,
                 protected=False):
        self.iri = iri
        self.type_mapping = type_mapping
        self.container = container or []
        self.language = language  # None = inherit; "" = @null
        self.reverse = reverse
        self.prefix_flag = prefix_flag
        self.local_ctx = local_ctx  # term-scoped @context (w3c c0xx tests)
        self.index_prop = index_prop  # property-based indexing (w3c pi0x)
        self.direction = direction  # None = inherit; "" = @null (w3c di0x)
        self.nest = nest  # @nest target for compaction (1.1)
        self.protected = protected  # @protected (1.1, w3c pr0x)


class _Ctx:
    def __init__(self, base: str = ""):
        self.terms: Dict[str, _TermDef] = {}
        self.base = base
        self.vocab: Optional[str] = None
        self.language: Optional[str] = None
        self.direction: Optional[str] = None  # default base direction
        self.previous: Optional["_Ctx"] = None  # set by type-scoped ctxs
        # property-scoped @propagate:false contexts apply to the IMMEDIATE
        # value and revert only below it (w3c so06)
        self.skip_one = False

    def copy(self) -> "_Ctx":
        c = _Ctx(self.base)
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.language = self.language
        c.direction = self.direction
        c.previous = self.previous
        c.skip_one = self.skip_one
        return c


def _same_term_def(a: "_TermDef", b: "_TermDef") -> bool:
    """Definition equality modulo @protected (protected terms may be
    re-declared identically)."""
    def key(td):
        lc = None if td.local_ctx is _NO_CTX else \
            json.dumps(td.local_ctx, sort_keys=True)
        return (td.iri, td.type_mapping, tuple(sorted(td.container)),
                td.language, td.reverse, td.prefix_flag, lc,
                td.index_prop, td.direction, td.nest)
    return key(a) == key(b)


def _is_abs_iri(v: str) -> bool:
    return ":" in v and not v.startswith("_:")


def _is_keyword(v) -> bool:
    return isinstance(v, str) and v in KEYWORDS


class Expander:
    def __init__(self, base: str = "", loader=None,
                 processing_mode: str = "json-ld-1.1"):
        # loader: Callable[[str IRI], parsed JSON] — the DocumentLoader
        # analogue (reference: rdf/jsonld_api.go:60-62); used for remote
        # contexts and @import
        self.base = base
        self.loader = loader
        self.processing_mode = processing_mode

    # ---- context processing ------------------------------------------

    def process_context(self, active: _Ctx, local,
                        override_protected: bool = False) -> _Ctx:
        result = active.copy()
        if local is None:
            local = [None]
        items = local if isinstance(local, list) else [local]
        for item in items:
            if item is None:
                if not override_protected and any(
                        td is not None and td.protected
                        for td in result.terms.values()):
                    raise ParseError(
                        "jsonld: invalid context nullification",
                        code="ERR_PROTECTED")
                result = _Ctx(self.base)
                continue
            if isinstance(item, str):
                # remote context via the DocumentLoader hook
                if self.loader is not None:
                    # remote context URLs resolve against the DOCUMENT base,
                    # not a context-modified @base (w3c c031)
                    url = resolve_iri(self.base, item) \
                        if not has_scheme(item) else item
                    try:
                        doc = self.loader(url)
                    except Exception as ex:
                        raise ParseError(
                            "jsonld: loading remote context failed: "
                            f"{url} ({type(ex).__name__})",
                            code="ERR_REMOTE_CONTEXT") from ex
                    if isinstance(doc, dict) and "@context" in doc:
                        result = self.process_context(result, doc["@context"])
                continue
            if not isinstance(item, dict):
                raise ParseError("jsonld: invalid local context")
            if "@import" in item and self.loader is not None and \
                    isinstance(item["@import"], str):
                try:
                    imported = self.loader(item["@import"])
                except Exception as ex:
                    raise ParseError(
                        "jsonld: loading @import failed: "
                        f"{item['@import']} ({type(ex).__name__})",
                        code="ERR_REMOTE_CONTEXT") from ex
                if isinstance(imported, dict):
                    ic = imported.get("@context", imported)
                    if isinstance(ic, dict):
                        # import merges under the importing context
                        item = {**ic, **{k: v for k, v in item.items()
                                         if k != "@import"}}
            if "@version" in item:
                if item["@version"] != 1.1:
                    raise ParseError("jsonld: invalid @version value",
                                     code="ERR_VERSION")
                if self.processing_mode == "json-ld-1.0":
                    raise ParseError("jsonld: processing mode conflict",
                                     code="ERR_MODE")
            if "@base" in item:
                v = item["@base"]
                if v is None:
                    result.base = ""
                elif isinstance(v, str):
                    result.base = resolve_iri(result.base, v) \
                        if result.base and not _is_abs_iri(v) else v
            if "@vocab" in item:
                v = item["@vocab"]
                if v is None:
                    result.vocab = None
                elif isinstance(v, str):
                    result.vocab = self.expand_iri(result, v, vocab=True,
                                                   doc_relative=True)
            if "@language" in item:
                v = item["@language"]
                result.language = v.lower() if isinstance(v, str) else None
            if "@direction" in item:
                v = item["@direction"]
                result.direction = v if v in ("ltr", "rtl") else None
            defined: Dict[str, bool] = {}
            for key in item:
                if key in ("@base", "@vocab", "@language", "@version",
                           "@propagate", "@protected", "@import",
                           "@direction"):
                    continue
                self.create_term(result, item, key, defined,
                                 override_protected=override_protected)
        # a freshly processed (element- or property-scoped) context
        # propagates by default — clear any inherited type-scope marker
        result.previous = None
        return result

    def create_term(self, ctx: _Ctx, local: dict, term: str,
                    defined: Dict[str, bool],
                    override_protected: bool = False) -> None:
        if term in defined:
            if defined[term]:
                return
            raise ParseError("jsonld: cyclic IRI mapping")
        value = local.get(term)
        if isinstance(value, dict):
            if self.processing_mode == "json-ld-1.0" and \
                    any(k in value for k in ("@prefix", "@nest", "@context")):
                raise ParseError(
                    "jsonld: term definition key not allowed in 1.0",
                    code="ERR_TERMDEF")
            if "@prefix" in value and not isinstance(value["@prefix"], bool):
                raise ParseError("jsonld: invalid @prefix value",
                                 code="ERR_TERMDEF")
            if "@prefix" in value and (":" in term or "/" in term):
                raise ParseError(
                    "jsonld: @prefix on a compact-IRI-form term",
                    code="ERR_TERMDEF")
            if "@container" in value and \
                    self.processing_mode == "json-ld-1.0":
                cv = value["@container"]
                if isinstance(cv, list) or cv in ("@id", "@type", "@graph"):
                    raise ParseError(
                        "jsonld: invalid container mapping for 1.0",
                        code="ERR_CONTAINER")
        if term == "@type":
            # @type may be redefined with @container:@set (+@protected);
            # record the @set so compaction keeps @type values as arrays
            if isinstance(value, dict) and set(value) <= {
                    "@container", "@protected"} and \
                    value.get("@container") in ("@set", ["@set"], None):
                if value.get("@container") is not None:
                    ctx.terms["@type"] = _TermDef("@type",
                                                  container=["@set"])
                defined[term] = True
                return
            raise ParseError("jsonld: keyword redefinition '@type'")
        if _is_keyword(term) or term == "":
            raise ParseError(f"jsonld: keyword redefinition {term!r}")
        if _KW_RE.match(term):
            # terms in the FORM of a keyword are ignored (w3c pr39)
            defined[term] = True
            return
        defined[term] = False
        if value is None or (isinstance(value, dict) and
                             value.get("@id") is None and "@id" in value):
            ctx.terms[term] = _TermDef(None)
            defined[term] = True
            return
        simple = False
        if isinstance(value, str):
            value = {"@id": value}
            simple = True
        if not isinstance(value, dict):
            raise ParseError("jsonld: invalid term definition")
        td = _TermDef(None)
        if "@type" in value:
            t = value["@type"]
            if not isinstance(t, str):
                raise ParseError("jsonld: invalid type mapping")
            if t not in ("@id", "@vocab", "@json", "@none"):
                t = self.expand_iri(ctx, t, vocab=True, local_ctx=local,
                                    defined=defined)
            td.type_mapping = t
        if "@reverse" in value and isinstance(value["@reverse"], str) and \
                not _is_keyword(value["@reverse"]) and \
                _KW_RE.match(value["@reverse"]):
            # keyword-like @reverse is ignored; term falls back to a
            # forward vocab mapping (w3c pr39)
            if ctx.vocab:
                td.iri = ctx.vocab + term
            else:
                ctx.terms.pop(term, None)
                defined[term] = True
                return
        elif "@reverse" in value:
            rv = value["@reverse"]
            if not isinstance(rv, str):
                raise ParseError("jsonld: invalid reverse mapping")
            td.iri = self.expand_iri(ctx, rv, vocab=True, local_ctx=local,
                                     defined=defined)
            td.reverse = True
        elif "@id" in value and value["@id"] != term and \
                not (kw_like := (isinstance(value["@id"], str) and
                                 not _is_keyword(value["@id"]) and
                                 bool(_KW_RE.match(value["@id"])))):
            # keyword-LIKE @id values ("@ignoreMe") fall through to the
            # vocab branch below (w3c pr37/e120); real keywords kept
            idv = value["@id"]
            if not isinstance(idv, str):
                raise ParseError("jsonld: invalid IRI mapping")
            td.iri = (idv if _is_keyword(idv) else
                      self.expand_iri(ctx, idv, vocab=True,
                                      doc_relative=True, local_ctx=local,
                                      defined=defined))
        else:
            # term with no explicit @id
            if ":" in term and not term.startswith(":"):
                prefix, suffix = term.split(":", 1)
                if prefix in local and not defined.get(prefix, True):
                    self.create_term(ctx, local, prefix, defined)
                pdef = ctx.terms.get(prefix)
                if pdef is not None and pdef.iri:
                    td.iri = pdef.iri + suffix
                else:
                    td.iri = term
            elif ctx.vocab:
                td.iri = ctx.vocab + term
            elif locals().get("kw_like"):
                # keyword-like @id with no vocab fallback: term dropped
                # entirely (w3c pr36)
                ctx.terms.pop(term, None)
                defined[term] = True
                return
            else:
                raise ParseError(f"jsonld: invalid IRI mapping for {term!r}")
        if "@container" in value:
            c = value["@container"]
            cs = c if isinstance(c, list) else [c]
            td.container = [x for x in cs if isinstance(x, str)]
            if self.processing_mode == "json-ld-1.0" and td.iri == "@type":
                td.container = []  # 1.0: no @set on an @type alias (t0106)
        if "@language" in value:
            lv = value["@language"]
            td.language = lv.lower() if isinstance(lv, str) else ""
        if "@direction" in value:
            dv = value["@direction"]
            td.direction = dv if dv in ("ltr", "rtl") else ""
        if "@context" in value:
            td.local_ctx = value["@context"]
        if "@nest" in value and isinstance(value["@nest"], str):
            td.nest = value["@nest"]
        if "@index" in value and isinstance(value["@index"], str):
            td.index_prop = value["@index"]
        if "@prefix" in value:
            td.prefix_flag = bool(value["@prefix"])
        elif simple and td.iri and td.iri[-1] in ":/?#[]@" and ":" not in term:
            td.prefix_flag = True
        td.protected = bool(value.get("@protected",
                                      local.get("@protected", False)))
        prev = ctx.terms.get(term)
        if prev is not None and prev.protected and not override_protected:
            if not _same_term_def(prev, td):
                raise ParseError("jsonld: protected term redefinition",
                                 code="ERR_PROTECTED")
            td.protected = True
        ctx.terms[term] = td
        defined[term] = True

    # ---- IRI expansion --------------------------------------------------

    def expand_iri(self, ctx: _Ctx, value: Optional[str], vocab: bool = False,
                   doc_relative: bool = False, local_ctx: Optional[dict] = None,
                   defined: Optional[Dict[str, bool]] = None) -> Optional[str]:
        if value is None or _is_keyword(value):
            return value
        if _KW_RE.match(value):
            return None  # keyword-like → ignored
        if local_ctx is not None and value in local_ctx and \
                not (defined or {}).get(value, False):
            self.create_term(ctx, local_ctx, value, defined or {})
        td = ctx.terms.get(value)
        if td is not None and td.iri is None:
            return None  # explicit null mapping decouples the term (e032)
        if td is not None and (_is_keyword(td.iri) or (vocab and td.iri)):
            return td.iri
        if ":" in value:
            prefix, suffix = value.split(":", 1)
            if prefix == "_" or suffix.startswith("//"):
                return value
            if local_ctx is not None and prefix in local_ctx and \
                    not (defined or {}).get(prefix, False):
                self.create_term(ctx, local_ctx, prefix, defined or {})
            pdef = ctx.terms.get(prefix)
            if pdef is not None and pdef.iri and pdef.prefix_flag:
                return pdef.iri + suffix
            # only scheme-shaped values stay as-is; "#x:y" or ":term"
            # fall through to vocab/base expansion (w3c e109/e117)
            if has_scheme(value):
                return value
        if vocab and ctx.vocab:
            return ctx.vocab + value
        if doc_relative and ctx.base:
            return resolve_iri(ctx.base, value)
        return value

    # ---- expansion -------------------------------------------------------

    def expand(self, ctx: _Ctx, active_prop: Optional[str], element,
               depth: int = 0, inside_list: bool = False,
               from_map: bool = False):
        if depth > 60:
            raise ParseError("jsonld: max depth exceeded", code="ERR_DEPTH")
        if element is None:
            return None
        td = ctx.terms.get(active_prop) if active_prop else None
        if isinstance(element, (str, int, float, bool)):
            if active_prop is None or active_prop == "@graph":
                return None
            return self.expand_value(ctx, active_prop, element)
        if isinstance(element, list):
            in_list = inside_list or active_prop == "@list" or \
                (td is not None and "@list" in td.container)
            out = []
            for item in element:
                if in_list and isinstance(item, list):
                    # list of lists (JSON-LD 1.1 li05-08): nested array →
                    # inner list object; keep active_prop for coercion
                    inner = self.expand(ctx, active_prop, item, depth + 1,
                                        inside_list=True)
                    if not isinstance(inner, list):
                        inner = [inner] if inner is not None else []
                    out.append({"@list": inner})
                    continue
                expanded = self.expand(ctx, active_prop, item, depth + 1)
                if isinstance(expanded, list):
                    out.extend(expanded)
                elif expanded is not None:
                    out.append(expanded)
            if in_list and not inside_list and active_prop != "@list":
                # array directly under a @list container IS the list
                return {"@list": out}
            return out
        if not isinstance(element, dict):
            raise ParseError("jsonld: invalid element")
        # type-scoped contexts of an ANCESTOR node do not propagate into
        # nested node objects (w3c c009) — EXCEPT when entering values of a
        # container map (spec expansion algo "frame/from map" guard,
        # w3c c013) or plain subject references
        if ctx.previous is not None and ctx.skip_one:
            ctx = ctx.copy()
            ctx.skip_one = False  # revert applies to the NEXT level down
        elif ctx.previous is not None and not from_map and \
                set(element) != {"@id"} and \
                not any(self.expand_iri(ctx, k, vocab=True) == "@value"
                        for k in element):
            ctx = ctx.previous
        if "@context" in element:
            pre_inline = ctx
            ctx = self.process_context(ctx, element["@context"])
            ec = element["@context"]
            for part in (ec if isinstance(ec, list) else [ec]):
                if isinstance(part, dict) and part.get("@propagate") is False:
                    # inline context marked non-propagating (w3c c028)
                    ctx.previous = pre_inline
        # type-scoped contexts: term definitions of the node's @type values
        # may carry their own @context (w3c c006, c007, …)
        type_terms: List[str] = []
        for k, v in element.items():
            if self.expand_iri(ctx, k, vocab=True) == "@type":
                for t in (v if isinstance(v, list) else [v]):
                    if isinstance(t, str):
                        type_terms.append(t)
        pre_type_ctx = ctx
        propagate_type_ctx = False
        for t in sorted(type_terms):
            # each type's term definition comes from the ORIGINAL context —
            # a prior type's scoped [null, …] reset must not hide it (c018)
            ttd = pre_type_ctx.terms.get(t) or ctx.terms.get(t)
            if ttd is not None and ttd.local_ctx is not _NO_CTX:
                ctx = self.process_context(ctx, ttd.local_ctx)
                lc = ttd.local_ctx
                for part in (lc if isinstance(lc, list) else [lc]):
                    if isinstance(part, dict) and part.get("@propagate") is True:
                        propagate_type_ctx = True
        if ctx is not pre_type_ctx and not propagate_type_ctx:
            ctx.previous = pre_type_ctx
        result: Dict[str, Any] = {}
        nests: List[str] = []
        for key in sorted(element.keys()):
            value = element[key]
            if key == "@context":
                continue
            expanded_prop = self.expand_iri(ctx, key, vocab=True)
            if expanded_prop is None or \
                    (":" not in expanded_prop and
                     not _is_keyword(expanded_prop)):
                continue
            if _is_keyword(expanded_prop):
                if expanded_prop == "@id":
                    if not isinstance(value, str):
                        raise ParseError("jsonld: invalid @id value")
                    expanded_id = self.expand_iri(ctx, value,
                                                  doc_relative=True)
                    # keyword-form @id stays as an explicit null in the
                    # expanded output (w3c 0122); the RDF layer drops the
                    # node (e122)
                    result["@id"] = expanded_id
                elif expanded_prop == "@type":
                    vals = value if isinstance(value, list) else [value]
                    types = []
                    for v in vals:
                        if not isinstance(v, str):
                            raise ParseError("jsonld: invalid @type value")
                        # @type values expand against the context BEFORE
                        # type-scoping (matters when a type-scoped context
                        # resets, w3c c014)
                        types.append(self.expand_iri(pre_type_ctx, v,
                                                     vocab=True,
                                                     doc_relative=True))
                    prev = result.get("@type", [])
                    result["@type"] = prev + types
                elif expanded_prop == "@graph":
                    g = self.expand(ctx, "@graph", value, depth + 1)
                    if not isinstance(g, list):
                        g = [g] if g is not None else []
                    result["@graph"] = g
                elif expanded_prop == "@value":
                    if value is not None and not isinstance(
                            value, (str, int, float, bool)) and \
                            result.get("@type") != "@json":
                        if not isinstance(value, (dict, list)):
                            raise ParseError("jsonld: invalid @value")
                    result["@value"] = value
                elif expanded_prop == "@language":
                    if not isinstance(value, str):
                        raise ParseError("jsonld: invalid @language")
                    result["@language"] = value.lower()
                elif expanded_prop == "@direction":
                    result["@direction"] = value
                elif expanded_prop == "@index":
                    if not isinstance(value, str):
                        raise ParseError("jsonld: invalid @index")
                    result["@index"] = value
                elif expanded_prop == "@list":
                    if active_prop is None or active_prop == "@graph":
                        continue
                    # items keep the active property's coercion (w3c e023)
                    lst = self.expand(ctx, active_prop, value, depth + 1,
                                      inside_list=True)
                    if not isinstance(lst, list):
                        lst = [lst] if lst is not None else []
                    result["@list"] = lst
                elif expanded_prop == "@set":
                    expanded = self.expand(ctx, active_prop, value, depth + 1)
                    if isinstance(expanded, dict) and "@set" not in expanded:
                        return expanded
                    return expanded
                elif expanded_prop == "@reverse":
                    if not isinstance(value, dict):
                        raise ParseError("jsonld: invalid @reverse value")
                    rev = self.expand(ctx, "@reverse", value, depth + 1)
                    if isinstance(rev, dict):
                        target = result.setdefault("@reverse", {})
                        for p, items in rev.items():
                            if p == "@reverse":
                                # reverse-of-reverse is forward (w3c e043)
                                for fp, fitems in items.items():
                                    result.setdefault(fp, []).extend(
                                        fitems if isinstance(fitems, list)
                                        else [fitems])
                                continue
                            if p.startswith("@"):
                                continue
                            target.setdefault(p, []).extend(
                                items if isinstance(items, list) else [items])
                        if not result["@reverse"]:
                            del result["@reverse"]  # all flipped forward (0043)
                elif expanded_prop == "@included":
                    inc = self.expand(ctx, None, value, depth + 1)
                    if not isinstance(inc, list):
                        inc = [inc] if inc is not None else []
                    result.setdefault("@included", []).extend(inc)
                elif expanded_prop == "@nest":
                    nests.append(key)
                continue
            ptd = ctx.terms.get(key)
            container = ptd.container if ptd else []
            # term-scoped context applies to this value's expansion
            value_ctx = ctx
            if ptd is not None and ptd.local_ctx is not _NO_CTX:
                # property-scoped contexts may override protection (pr06+)
                value_ctx = self.process_context(ctx, ptd.local_ctx,
                                                 override_protected=True)
                lc = ptd.local_ctx
                for part in (lc if isinstance(lc, list) else [lc]):
                    if isinstance(part, dict) and \
                            part.get("@propagate") is False:
                        # non-propagating property-scoped context: applies
                        # to the immediate value, reverts below it (so06)
                        value_ctx.previous = ctx
                        value_ctx.skip_one = True
            ctx_saved = ctx
            ctx = value_ctx
            if ptd and ptd.type_mapping == "@json":
                expanded_value: Any = [{"@value": value, "@type": "@json"}]
            elif "@language" in container and isinstance(value, dict):
                expanded_value = []
                for lang in sorted(value.keys()):
                    lv = value[lang]
                    lang_exp = self.expand_iri(ctx, lang, vocab=True)
                    for item in (lv if isinstance(lv, list) else [lv]):
                        if item is None:
                            continue
                        if not isinstance(item, str):
                            raise ParseError("jsonld: invalid language map")
                        ev = {"@value": item}
                        if lang != "@none" and lang_exp != "@none":
                            ev["@language"] = lang.lower()
                        direction = ptd.direction if ptd and \
                            ptd.direction is not None else ctx.direction
                        if direction:
                            ev["@direction"] = direction
                        expanded_value.append(ev)
            elif ("@index" in container or "@id" in container or
                  "@type" in container) and isinstance(value, dict):
                expanded_value = []
                graph_map = "@graph" in container
                for raw_idx in sorted(value.keys()):
                    raw_item = value[raw_idx]
                    # map keys may alias @none via a term def (w3c m012+)
                    idx_exp = self.expand_iri(ctx, raw_idx, vocab=True)
                    idx = "@none" if idx_exp == "@none" else raw_idx
                    if "@type" in container and isinstance(raw_item, str) \
                            and (ptd is None or ptd.type_mapping not in
                                 ("@id", "@vocab")):
                        # string values in @type maps are node refs (m017);
                        # an explicit @id/@vocab coercion handles its own
                        # expansion (m019)
                        raw_item = {"@id": raw_item}
                    injected_type = False
                    map_ctx = ctx
                    if "@type" in container and idx != "@none":
                        # spec 13.9: @type maps expand their values from the
                        # PREVIOUS (pre-type-scope) context, plus the map
                        # key's own scoped context (w3c c013)
                        map_ctx = ctx.previous if ctx.previous is not None \
                            else ctx
                        ktd = map_ctx.terms.get(idx) or ctx.terms.get(idx)
                        if ktd is not None and ktd.local_ctx is not _NO_CTX:
                            map_ctx = self.process_context(map_ctx,
                                                           ktd.local_ctx)
                    iv = self.expand(map_ctx, key, raw_item, depth + 1,
                                     from_map=True)
                    if iv is None:
                        continue
                    items = iv if isinstance(iv, list) else [iv]
                    for item in items:
                        if graph_map:
                            # graph map (w3c e084-e094): key names/indexes
                            # the graph; explicit graph objects are NOT
                            # re-wrapped here (unlike the plain @graph
                            # container, e095)
                            if not (isinstance(item, dict) and
                                    "@graph" in item and
                                    "@value" not in item):
                                item = {"@graph": [item]}
                            else:
                                item = dict(item)
                            if "@id" in container and idx != "@none":
                                item["@id"] = self.expand_iri(
                                    ctx, idx, doc_relative=True)
                            elif "@index" in container and idx != "@none":
                                if ptd is not None and \
                                        ptd.index_prop is not None:
                                    # property-based graph index (pi11):
                                    # key becomes a property of the wrapper
                                    pi = self.expand_iri(ctx, ptd.index_prop,
                                                         vocab=True)
                                    item[pi] = item.get(pi, []) + \
                                        [self.expand_value(ctx,
                                                           ptd.index_prop,
                                                           idx)]
                                else:
                                    item["@index"] = idx
                        elif "@index" in container and idx != "@none" and \
                                ptd is not None and \
                                ptd.index_prop is not None and \
                                isinstance(item, dict) and \
                                "@list" not in item and \
                                "@value" not in item:
                            # property-based indexing (w3c pi06-pi11): the
                            # map key becomes a VALUE of the index property
                            pi = self.expand_iri(ctx, ptd.index_prop,
                                                 vocab=True)
                            iv_val = self.expand_value(ctx, ptd.index_prop,
                                                       idx)
                            item = {**item,
                                    pi: item.get(pi, []) + [iv_val]}
                        elif "@index" in container and idx != "@none" and \
                                isinstance(item, dict) and \
                                "@index" not in item and \
                                "@list" not in item:
                            item = {**item, "@index": idx}
                        elif "@id" in container and idx != "@none" and \
                                isinstance(item, dict) and "@id" not in item:
                            item = {**item,
                                    "@id": self.expand_iri(ctx, idx,
                                                           doc_relative=True)}
                        elif "@type" in container and idx != "@none" and \
                                not injected_type and isinstance(item, dict):
                            tv = self.expand_iri(ctx, idx, vocab=True,
                                                 doc_relative=True)
                            item = {**item,
                                    "@type": [tv] + item.get("@type", [])}
                        expanded_value.append(item)
            else:
                expanded_value = self.expand(ctx, key, value, depth + 1)
            ctx = ctx_saved
            if expanded_value is None:
                continue
            if not isinstance(expanded_value, list):
                expanded_value = [expanded_value]
            if "@list" in container and not (
                    len(expanded_value) == 1 and
                    isinstance(expanded_value[0], dict) and
                    "@list" in expanded_value[0]):
                expanded_value = [{"@list": expanded_value}]
            if "@graph" in container and "@id" not in container and \
                    "@index" not in container:
                # @container:@graph wraps each value in a graph object —
                # ALWAYS, even when the value is itself a graph object
                # (w3c e079-e081, e095-e097)
                expanded_value = [{"@graph": [v]} for v in expanded_value]
            if ptd and ptd.reverse:
                target = result.setdefault("@reverse", {})
                target.setdefault(expanded_prop, []).extend(expanded_value)
            else:
                result.setdefault(expanded_prop, []).extend(expanded_value)
        for nest_key in nests:
            nv = element[nest_key]
            # a term aliasing @nest may carry its own scoped context which
            # applies to the nested object (w3c c037/c038)
            nest_ctx = ctx
            ntd = ctx.terms.get(nest_key)
            if ntd is not None and ntd.local_ctx is not _NO_CTX:
                nest_ctx = self.process_context(ctx, ntd.local_ctx,
                                                override_protected=True)
            for nested in (nv if isinstance(nv, list) else [nv]):
                if not isinstance(nested, dict):
                    raise ParseError("jsonld: invalid @nest value")
                expanded = self.expand(nest_ctx, active_prop, nested,
                                       depth + 1)
                if isinstance(expanded, dict):
                    # nested keys are treated as if they were keys of the
                    # containing node — @id/@type/@included merge too (in06)
                    for p, items in expanded.items():
                        if p == "@id":
                            result.setdefault("@id", items)
                        elif p == "@reverse":
                            tgt = result.setdefault("@reverse", {})
                            for rp, ritems in items.items():
                                tgt.setdefault(rp, []).extend(ritems)
                        elif p == "@value":
                            raise ParseError("jsonld: invalid @nest value")
                        elif p in ("@index",):
                            result.setdefault(p, items)
                        elif p.startswith("@") and p not in (
                                "@type", "@included"):
                            continue
                        else:
                            result.setdefault(p, []).extend(
                                items if isinstance(items, list)
                                else [items])
        # value-object cleanup
        if "@value" in result:
            v = result["@value"]
            if result.get("@type") == ["@json"] or result.get("@type") == "@json":
                result["@type"] = "@json"
            elif v is None:
                return None
            elif "@language" in result and not isinstance(v, str):
                raise ParseError("jsonld: language-tagged non-string")
            # in expanded form a value object's @type is a STRING, not an
            # array (spec expansion step 14; w3c expand 0002)
            if isinstance(result.get("@type"), list) and \
                    len(result["@type"]) == 1:
                result["@type"] = result["@type"][0]
            if active_prop in (None, "@graph"):
                return None  # free-floating value object dropped (0045)
            return result
        if "@type" in result and not isinstance(result["@type"], list):
            result["@type"] = [result["@type"]]
        if set(result) == {"@language"}:
            return None
        if active_prop in (None, "@graph"):
            if not result or set(result) <= {"@value", "@list"}:
                return None
            if set(result) == {"@id"}:
                return None
            return result
        # under a property, an empty node object is a fresh blank node
        # (w3c e016 "emptyobj")
        return result

    def expand_value(self, ctx: _Ctx, active_prop: str, value):
        td = ctx.terms.get(active_prop)
        tm = td.type_mapping if td else None
        if tm == "@id" and isinstance(value, str):
            return {"@id": self.expand_iri(ctx, value, doc_relative=True)}
        if tm == "@vocab" and isinstance(value, str):
            return {"@id": self.expand_iri(ctx, value, vocab=True,
                                           doc_relative=True)}
        result: Dict[str, Any] = {"@value": value}
        if tm and tm not in ("@id", "@vocab", "@none", "@json"):
            result["@type"] = tm
        elif isinstance(value, str):
            lang = td.language if td and td.language is not None \
                else ctx.language
            if lang:
                result["@language"] = lang
            direction = td.direction if td and td.direction is not None \
                else ctx.direction
            if direction:
                result["@direction"] = direction
        return result


# ---------------------------------------------------------------------------
# Deserialize expanded JSON-LD to RDF
# ---------------------------------------------------------------------------

def _canonical_double(v: float) -> str:
    """XSD canonical double: mantissa E exponent (JSON-LD data round
    tripping: %1.15E with trailing zeros trimmed)."""
    if v == 0:
        return "-0.0E0" if math.copysign(1, v) < 0 else "0.0E0"
    s = f"{v:1.15E}"
    mant, exp = s.split("E")
    mant = mant.rstrip("0")
    if mant.endswith("."):
        mant += "0"
    expn = int(exp)
    return f"{mant}E{expn}"


class _ToRdf:
    def __init__(self, rdf_direction: Optional[str] = None,
                 generalized: bool = False):
        self.rdf_direction = rdf_direction
        self.generalized = generalized
        self.counter = 0
        self.bnode_map: Dict[str, str] = {}
        self.quads: List[Quad] = []

    def bnode(self, label: Optional[str] = None) -> BlankNode:
        if label is not None:
            if label not in self.bnode_map:
                self.bnode_map[label] = f"b{self.counter}"
                self.counter += 1
            return BlankNode(self.bnode_map[label])
        b = BlankNode(f"b{self.counter}")
        self.counter += 1
        return b

    @staticmethod
    def _well_formed(iri: str) -> bool:
        if any(ch in iri for ch in ' \t\n\r<>"{}|^`'):
            return False
        if iri.count("#") > 1:
            return False  # second '#' inside a fragment (RFC 3986; e111)
        return _is_abs_iri(iri)

    def node_term(self, ident: str) -> Optional[Term]:
        if ident.startswith("_:"):
            return self.bnode(ident[2:])
        if not self._well_formed(ident):
            return None  # ill-formed IRI → triple dropped (spec: warn)
        return IRI(ident)

    def object_term(self, item, graph: Optional[Term]) -> Optional[Term]:
        if not isinstance(item, dict):
            return None
        if "@list" in item:
            return self.list_term(item["@list"], graph)
        if "@value" in item:
            v = item["@value"]
            dt = item.get("@type")
            if isinstance(dt, list):
                dt = dt[0] if dt else None
            lang = item.get("@language")
            if dt == "@json":
                from ..functions.jcs import canonicalize_json
                lex = canonicalize_json(json.dumps(v))
                return Literal(lex, datatype=RDF_NS + "JSON")
            direction = item.get("@direction")
            if direction and self.rdf_direction == "i18n-datatype" and \
                    isinstance(v, str):
                return Literal(v, datatype="https://www.w3.org/ns/i18n#"
                               f"{(lang or '').lower()}_{direction}")
            if direction and self.rdf_direction == "compound-literal" and \
                    isinstance(v, str):
                b = self.bnode()
                self.quads.append(Quad(b, IRI(RDF_NS + "value"),
                                       Literal(v), graph))
                if lang:
                    self.quads.append(Quad(b, IRI(RDF_NS + "language"),
                                           Literal(lang.lower()), graph))
                self.quads.append(Quad(b, IRI(RDF_NS + "direction"),
                                       Literal(direction), graph))
                return b
            if isinstance(v, bool):
                return Literal("true" if v else "false",
                               datatype=dt or XSD_BOOLEAN)
            if isinstance(v, float) or (dt == XSD_DOUBLE and
                                        isinstance(v, (int, float))):
                if isinstance(v, int) and dt != XSD_DOUBLE:
                    return Literal(str(v), datatype=dt or XSD_INTEGER)
                if (isinstance(v, float) and (v != int(v) or abs(v) >= 1e21
                                              or dt == XSD_DOUBLE)) or \
                        dt == XSD_DOUBLE:
                    return Literal(_canonical_double(float(v)),
                                   datatype=dt or XSD_DOUBLE)
                return Literal(str(int(v)), datatype=dt or XSD_INTEGER)
            if isinstance(v, int):
                return Literal(str(v), datatype=dt or XSD_INTEGER)
            if lang:
                from ..terms import is_valid_lang_tag
                if not is_valid_lang_tag(lang):
                    return None  # ill-formed language tag → dropped (wf05)
                return Literal(str(v), lang=lang)
            return Literal(str(v), datatype=dt or "")
        if "@id" in item and isinstance(item["@id"], str):
            ident = item["@id"]
            if not (ident.startswith("_:") or _is_abs_iri(ident)):
                return None
            return self.node_term(ident)
        return None

    def list_term(self, items: List, graph: Optional[Term]) -> Term:
        if not items:
            return IRI(RDF_NIL)
        head = self.bnode()
        node = head
        for i, item in enumerate(items):
            obj = self.object_term(item, graph)
            if obj is not None:
                self.quads.append(Quad(node, IRI(RDF_FIRST), obj, graph))
            elif isinstance(item, dict) and ("@id" in item or
                                             any(not k.startswith("@")
                                                 for k in item)):
                nid = self.node_id(item)
                nt = self.node_term(nid) if nid is not None else None
                if nt is not None:
                    self.quads.append(Quad(node, IRI(RDF_FIRST), nt, graph))
                    self.emit_node(item, graph, nid)
            nxt = self.bnode() if i + 1 < len(items) else IRI(RDF_NIL)
            self.quads.append(Quad(node, IRI(RDF_REST), nxt, graph))
            node = nxt
        return head

    def node_id(self, node: dict) -> Optional[str]:
        ident = node.get("@id")
        if isinstance(ident, str):
            return ident
        if "@id" in node:
            # explicit null @id (keyword-form @id, w3c 0122/e122): the node
            # and every triple referencing it are dropped
            return None
        fresh = "_:fresh" + str(len(self.bnode_map) + self.counter)
        node["@id"] = fresh
        return fresh

    def emit_node(self, node: dict, graph: Optional[Term],
                  ident: Optional[str] = None) -> Optional[Term]:
        if "@value" in node or "@list" in node:
            return None
        ident = ident or self.node_id(node)
        if ident is None:
            return None
        if not (ident.startswith("_:") or _is_abs_iri(ident)):
            return None
        subject = self.node_term(ident)
        if subject is None:
            return None
        for t in node.get("@type", []):
            if isinstance(t, str) and (_is_abs_iri(t) or t.startswith("_:")):
                tt = self.node_term(t)
                if tt is not None:
                    self.quads.append(Quad(subject, IRI(RDF_TYPE), tt, graph))
        for prop in sorted(node.keys()):
            if prop.startswith("@"):
                if prop == "@reverse":
                    for rp, ritems in node["@reverse"].items():
                        if not _is_abs_iri(rp):
                            continue
                        for ritem in ritems:
                            ro = self.resolve_object(ritem, graph)
                            if ro is not None and not isinstance(ro, Literal):
                                self.quads.append(
                                    Quad(ro, IRI(rp), subject, graph))
                elif prop == "@included":
                    for inc in node["@included"]:
                        self.emit_node(inc, graph)
                elif prop == "@graph":
                    for gnode in node["@graph"]:
                        if isinstance(gnode, dict):
                            self.emit_node(gnode, subject)
                continue
            if not (_is_abs_iri(prop) or prop.startswith("_:")):
                continue
            if prop.startswith("_:"):
                if not self.generalized:
                    continue  # generalized RDF off (spec default)
                pred: Term = self.bnode(prop[2:])
            elif not self._well_formed(prop):
                continue
            else:
                pred = IRI(prop)
            for item in node[prop]:
                obj = self.resolve_object(item, graph)
                if obj is not None:
                    self.quads.append(Quad(subject, pred, obj, graph))
        return subject

    def resolve_object(self, item, graph: Optional[Term]) -> Optional[Term]:
        if not isinstance(item, dict):
            return None
        if "@value" in item or "@list" in item:
            return self.object_term(item, graph)
        ident = self.node_id(item)
        if ident is None:
            return None
        if not (ident.startswith("_:") or _is_abs_iri(ident)):
            return None
        term = self.node_term(ident)
        if term is None:
            return None
        self.emit_node(item, graph, ident)
        return term


def expand(text_or_doc, base: str = "", expand_context=None, loader=None,
           processing_mode: str = "json-ld-1.1"):
    doc = json.loads(text_or_doc) if isinstance(text_or_doc, str) \
        else text_or_doc
    exp = Expander(base, loader=loader, processing_mode=processing_mode)
    ctx = _Ctx(base)
    if expand_context is not None:
        ec = expand_context
        if isinstance(ec, dict) and "@context" in ec:
            ec = ec["@context"]
        ctx = exp.process_context(ctx, ec)
    result = exp.expand(ctx, None, doc)
    if result is None:
        return []
    if isinstance(result, dict):
        if set(result) == {"@graph"}:
            result = result["@graph"]
        else:
            result = [result]
    return result


def to_rdf(text: str, base: str = "", expand_context=None,
           rdf_direction: Optional[str] = None, loader=None,
           generalized: bool = False
           ) -> Tuple[List[Quad], List[ParseError]]:
    """Full-processor ToRDF: expansion + spec-numeric RDF deserialization.
    ``expand_context``: external context (parsed JSON) applied before the
    document's own (the API's expandContext option); ``loader``: the
    DocumentLoader analogue for remote contexts / @import."""
    try:
        expanded = expand(text, base=base, expand_context=expand_context,
                          loader=loader)
    except ParseError as e:
        return [], [e]
    except RecursionError:
        return [], [ParseError("max depth exceeded", code="ERR_DEPTH")]
    conv = _ToRdf(rdf_direction=rdf_direction, generalized=generalized)
    try:
        for node in expanded:
            if isinstance(node, dict):
                conv.emit_node(node, None)
    except ParseError as e:
        return conv.quads, [e]
    # dedupe (RDF dataset is a set)
    seen = set()
    out = []
    for q in conv.quads:
        if q not in seen:
            seen.add(q)
            out.append(q)
    return out, []


# ---------------------------------------------------------------------------
# Serialize RDF as JSON-LD (the FromRDF direction)
# ---------------------------------------------------------------------------

_RDF_LIST = RDF_NS + "List"
_RDF_VALUE = RDF_NS + "value"
_RDF_LANGUAGE = RDF_NS + "language"
_RDF_DIRECTION = RDF_NS + "direction"
_I18N_NS = "https://www.w3.org/ns/i18n#"
_INT_RE = re.compile(r"^[+-]?[0-9]+$")


def _term_ident(t: Term) -> str:
    return t.value if isinstance(t, IRI) else "_:" + t.id


def _rdf_to_object(o: Term, use_native_types: bool,
                   rdf_direction: Optional[str]) -> dict:
    """Spec "RDF to Object" conversion: one RDF term → one expanded
    JSON-LD object."""
    if isinstance(o, (IRI, BlankNode)):
        return {"@id": _term_ident(o)}
    lex, dt, lang = o.lexical, o.datatype, o.lang
    if lang:
        # RDF 1.2 directional language tags render as "lang--dir"
        base_lang, _, direction = lang.partition("--")
        r: Dict[str, Any] = {"@value": lex, "@language": base_lang}
        if direction:
            r["@direction"] = direction
        return r
    dt = dt or XSD_STRING
    if use_native_types:
        if dt == XSD_BOOLEAN and lex in ("true", "1"):
            return {"@value": True}
        if dt == XSD_BOOLEAN and lex in ("false", "0"):
            return {"@value": False}
        if dt == XSD_INTEGER and _INT_RE.match(lex):
            return {"@value": int(lex)}
        if dt == XSD_DOUBLE:
            try:
                v = float(lex)
                if math.isfinite(v):
                    return {"@value": v}
            except ValueError:
                pass
    if dt == RDF_NS + "JSON":
        try:
            return {"@value": json.loads(lex), "@type": "@json"}
        except ValueError:
            pass
    if rdf_direction == "i18n-datatype" and dt.startswith(_I18N_NS):
        frag = dt[len(_I18N_NS):]
        blang, _, direction = frag.partition("_")
        r = {"@value": lex}
        if blang:
            r["@language"] = blang
        if direction:
            r["@direction"] = direction
        return r
    if dt == XSD_STRING:
        return {"@value": lex}
    return {"@value": lex, "@type": dt}


def from_rdf(quads: List[Quad], use_native_types: bool = False,
             use_rdf_type: bool = False,
             rdf_direction: Optional[str] = None,
             ordered: bool = True) -> List[dict]:
    """Serialize an RDF dataset as expanded JSON-LD — the spec "Serialize
    RDF as JSON-LD" algorithm, with rdf:List reassembly into @list and
    optional i18n / compound-literal direction recovery. Reference
    analogue: JSONLDProcessor.FromRDF (rdf/jsonld_api.go:75) via json-gold.
    Blank node labels from the input dataset are preserved verbatim."""
    default_graph: Dict[str, dict] = {}
    graph_map: Dict[str, Dict[str, dict]] = {"@default": default_graph}
    referenced_once: Dict[str, Any] = {}
    compound_subjects: Dict[str, List[str]] = {}
    usages: Dict[Tuple[str, str], List[dict]] = {}  # (graph, nodeid)

    seen: set = set()
    for q in quads:
        if not isinstance(q.s, (IRI, BlankNode)) or not isinstance(q.p, IRI):
            continue  # triple terms are out of scope for serialization
        if q in seen:
            continue  # an RDF dataset is a SET (w3c fromRdf 0022)
        seen.add(q)
        gname = "@default" if q.g is None else _term_ident(q.g)
        node_map = graph_map.setdefault(gname, {})
        if gname != "@default":
            default_graph.setdefault(gname, {"@id": gname})
        s = _term_ident(q.s)
        p = q.p.value
        node = node_map.setdefault(s, {"@id": s})
        o_node = isinstance(q.o, (IRI, BlankNode))
        oid = _term_ident(q.o) if o_node else None
        if o_node:
            node_map.setdefault(oid, {"@id": oid})
        if rdf_direction == "compound-literal" and p == _RDF_DIRECTION:
            compound_subjects.setdefault(gname, []).append(s)
        if p == RDF_TYPE and o_node and not use_rdf_type:
            types = node.setdefault("@type", [])
            if oid not in types:
                types.append(oid)
            continue
        value = _rdf_to_object(q.o, use_native_types, rdf_direction)
        vals = node.setdefault(p, [])
        # dedup must distinguish bool from int (json.dumps does; Python ==
        # treats 1 == True — w3c fromRdf 0018); keep the stored object's
        # identity so the @list rewrite mutates in place
        vkey = json.dumps(value, sort_keys=True)
        existing = next((v for v in vals
                         if json.dumps(v, sort_keys=True) == vkey), None)
        if existing is not None:
            value = existing
        else:
            vals.append(value)
        if oid == RDF_NIL:
            usages.setdefault((gname, oid), []).append(
                {"node": node, "property": p, "value": value})
        elif oid in referenced_once:
            referenced_once[oid] = False
        elif o_node and oid.startswith("_:"):
            referenced_once[oid] = {"node": node, "property": p,
                                    "value": value}

    # compound-literal conversion (di09-di12)
    for gname, cls in compound_subjects.items():
        node_map = graph_map[gname]
        for cl in cls:
            entry = referenced_once.get(cl)
            if not isinstance(entry, dict):
                continue
            cl_node = node_map.pop(cl, None)
            if cl_node is None:
                continue
            value = entry["value"]
            value.pop("@id", None)
            vv = cl_node.get(_RDF_VALUE, [{}])[0]
            value["@value"] = vv.get("@value")
            langs = cl_node.get(_RDF_LANGUAGE)
            if langs:
                value["@language"] = str(langs[0].get("@value", "")).lower()
            dirs = cl_node.get(_RDF_DIRECTION)
            if dirs:
                value["@direction"] = dirs[0].get("@value")

    # rdf:List → @list reassembly
    def _is_list_node(n: dict) -> bool:
        keys = set(n) - {"@id"}
        if n.get("@type") not in (None, [_RDF_LIST]):
            return False
        keys.discard("@type")
        return keys == {RDF_FIRST, RDF_REST} and \
            len(n[RDF_FIRST]) == 1 and len(n[RDF_REST]) == 1

    for gname, node_map in graph_map.items():
        for usage in usages.get((gname, RDF_NIL), []):
            node, prop, head = usage["node"], usage["property"], \
                usage["value"]
            lst: List[dict] = []
            list_nodes: List[str] = []
            while prop == RDF_REST and node["@id"].startswith("_:") and \
                    isinstance(referenced_once.get(node["@id"]), dict) and \
                    _is_list_node(node):
                lst.append(node[RDF_FIRST][0])
                list_nodes.append(node["@id"])
                nxt = referenced_once[node["@id"]]
                node, prop, head = nxt["node"], nxt["property"], \
                    nxt["value"]
                if not node["@id"].startswith("_:"):
                    break
            head.pop("@id", None)
            head["@list"] = list(reversed(lst))
            for nid in list_nodes:
                node_map.pop(nid, None)

    # assemble: default-graph nodes, named graphs nested under @graph
    result: List[dict] = []
    subjects = sorted(default_graph) if ordered else list(default_graph)
    for subject in subjects:
        node = default_graph[subject]
        if subject in graph_map and subject != "@default":
            gm = graph_map[subject]
            gsubs = sorted(gm) if ordered else list(gm)
            node["@graph"] = [gm[gs] for gs in gsubs
                              if set(gm[gs]) != {"@id"}]
        if set(node) != {"@id"}:
            result.append(node)
    return result
