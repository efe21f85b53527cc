"""JSON-LD Flattening and Compaction — the remaining JSONLDProcessor
surface (reference: Flatten/Compact at rdf/jsonld_api.go:75-76,99-118,
delegated there to json-gold; implemented natively here on top of the
expansion core in jsonld_full.py).

Algorithms follow the JSON-LD 1.1 API spec: Node Map Generation,
Flattening, Inverse Context Creation, Term Selection, IRI Compaction,
Value Compaction, and the Compaction algorithm proper.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional

from ..terms import ParseError
from .jsonld_full import KEYWORDS, _Ctx, _NO_CTX, Expander, expand


def _json_key(v) -> str:
    return json.dumps(v, sort_keys=True)


def _add_unique(arr: List, v) -> None:
    k = _json_key(v)
    if not any(_json_key(x) == k for x in arr):
        arr.append(v)


class _Issuer:
    def __init__(self, prefix: str = "b"):
        self.prefix = prefix
        self.counter = 0
        self.issued: Dict[str, str] = {}

    def issue(self, old: Optional[str] = None) -> str:
        if old is not None and old in self.issued:
            return self.issued[old]
        new = f"_:{self.prefix}{self.counter}"
        self.counter += 1
        if old is not None:
            self.issued[old] = new
        return new


# ---------------------------------------------------------------------------
# Node Map Generation + Flattening
# ---------------------------------------------------------------------------

def generate_node_map(element, node_map: Dict[str, Dict[str, dict]],
                      issuer: _Issuer, active_graph: str = "@default",
                      active_subject=None, active_property: Optional[str] = None,
                      list_obj: Optional[dict] = None) -> None:
    """Spec "Node Map Generation": builds node_map[graph][id] from an
    expanded document, relabeling every blank node via ``issuer``."""
    if isinstance(element, list):
        for item in element:
            generate_node_map(item, node_map, issuer, active_graph,
                              active_subject, active_property, list_obj)
        return
    graph = node_map.setdefault(active_graph, {})
    node = None
    if isinstance(active_subject, str):
        node = graph.get(active_subject)
    if isinstance(element, dict) and "@type" in element:
        tv = element["@type"]
        if isinstance(tv, list):
            element["@type"] = [
                issuer.issue(t) if isinstance(t, str) and t.startswith("_:")
                else t for t in tv]
        elif isinstance(tv, str):
            # value objects keep their string-form @type
            element["@type"] = issuer.issue(tv) if tv.startswith("_:") \
                else tv
    if isinstance(element, dict) and "@value" in element:
        if list_obj is None:
            if node is not None and active_property:
                _add_unique(node.setdefault(active_property, []), element)
        else:
            list_obj["@list"].append(element)
        return
    if isinstance(element, dict) and "@list" in element:
        result = {"@list": []}
        generate_node_map(element["@list"], node_map, issuer, active_graph,
                          active_subject, active_property, result)
        if list_obj is None:
            if node is not None and active_property:
                node.setdefault(active_property, []).append(result)
        else:
            list_obj["@list"].append(result)
        return
    if not isinstance(element, dict):
        return
    # node object
    ident = element.get("@id")
    if ident is None and "@id" in element:
        return  # explicit null @id: dropped
    if isinstance(ident, str) and ident.startswith("_:"):
        ident = issuer.issue(ident)
    elif ident is None:
        ident = issuer.issue()
    entry = graph.setdefault(ident, {"@id": ident})
    if isinstance(active_subject, dict):
        # reverse relationship: the VALUE node points back at the subject
        _add_unique(entry.setdefault(active_property, []), active_subject)
    elif active_property is not None:
        reference = {"@id": ident}
        if list_obj is None:
            if node is not None:
                _add_unique(node.setdefault(active_property, []), reference)
        else:
            list_obj["@list"].append(reference)
    if "@type" in element:
        types = entry.setdefault("@type", [])
        for t in element["@type"]:
            if t not in types:
                types.append(t)
    if "@index" in element:
        if "@index" in entry and entry["@index"] != element["@index"]:
            raise ParseError("jsonld: conflicting indexes")
        entry["@index"] = element["@index"]
    if "@reverse" in element:
        referenced = {"@id": ident}
        for prop, values in element["@reverse"].items():
            for value in values:
                generate_node_map(value, node_map, issuer, active_graph,
                                  referenced, prop)
    if "@included" in element:
        generate_node_map(element["@included"], node_map, issuer,
                          active_graph)
    if "@graph" in element:
        generate_node_map(element["@graph"], node_map, issuer, ident)
    for prop in sorted(element):
        if prop.startswith("@") and prop in KEYWORDS:
            continue
        value = element[prop]
        if prop.startswith("_:"):
            prop = issuer.issue(prop)
        entry.setdefault(prop, [])
        generate_node_map(value, node_map, issuer, active_graph, ident, prop)


def flatten(text_or_doc, context=None, base: str = "", loader=None,
            compact_arrays: bool = True, ordered: bool = True,
            processing_mode: str = "json-ld-1.1") -> Any:
    """Spec Flattening: expand → node map → flat array of subjects;
    named graphs nest under their graph node's @graph. With ``context``,
    the result is compacted."""
    expanded = expand(text_or_doc, base=base, loader=loader,
                      processing_mode=processing_mode)
    node_map: Dict[str, Dict[str, dict]] = {"@default": {}}
    generate_node_map(expanded, node_map, _Issuer())
    default_graph = node_map["@default"]
    for graph_name in sorted(node_map):
        if graph_name == "@default":
            continue
        entry = default_graph.setdefault(graph_name, {"@id": graph_name})
        graph = node_map[graph_name]
        entry["@graph"] = [graph[gid] for gid in sorted(graph)
                           if set(graph[gid]) != {"@id"}]
    flattened = [default_graph[sid] for sid in sorted(default_graph)
                 if set(default_graph[sid]) != {"@id"}]
    if context is None:
        return flattened
    result = compact(flattened, context, base=base, loader=loader,
                     compact_arrays=compact_arrays, ordered=ordered,
                     processing_mode=processing_mode)
    # API flatten step 8: with a context the node list always sits under
    # @graph, even when compaction collapsed it to a single node map
    # (w3c html/f001) or an array (defensive)
    if isinstance(result, list):
        return {"@graph": result}
    rest = {k: v for k, v in result.items() if k != "@context"}
    if rest and set(rest) != {"@graph"}:
        wrapped = {"@graph": [rest]}
        if "@context" in result:
            wrapped = {"@context": result["@context"], "@graph": [rest]}
        return wrapped
    return result


# ---------------------------------------------------------------------------
# Inverse context + term selection
# ---------------------------------------------------------------------------

def _default_lang_dir(ctx: _Ctx) -> str:
    lang = (ctx.language or "@none").lower()
    direction = ctx.direction or "@none"
    if direction != "@none":
        return f"{lang}_{direction}" if lang != "@none" \
            else f"_{direction}"
    return lang


def create_inverse_context(ctx: _Ctx) -> Dict[str, dict]:
    inverse: Dict[str, dict] = {}
    default_ld = _default_lang_dir(ctx)
    for term in sorted(ctx.terms, key=lambda t: (len(t), t)):
        td = ctx.terms[term]
        if td is None or td.iri is None:
            continue
        container = "".join(sorted(td.container)) or "@none"
        entry = inverse.setdefault(td.iri, {}).setdefault(
            container, {"@language": {}, "@type": {}, "@any": {}})
        entry["@any"].setdefault("@none", term)
        if td.reverse:
            entry["@type"].setdefault("@reverse", term)
        elif td.type_mapping == "@none":
            entry["@language"].setdefault("@any", term)
            entry["@type"].setdefault("@any", term)
            entry["@any"].setdefault("@none", term)
        elif td.type_mapping is not None:
            entry["@type"].setdefault(td.type_mapping, term)
        elif td.language is not None and td.direction is not None:
            if td.language and td.direction:
                key = f"{td.language}_{td.direction}"
            elif td.language:
                key = td.language
            elif td.direction:
                key = f"_{td.direction}"
            else:
                key = "@null"
            entry["@language"].setdefault(key, term)
        elif td.language is not None:
            entry["@language"].setdefault(td.language or "@null", term)
        elif td.direction is not None:
            entry["@language"].setdefault(
                f"_{td.direction}" if td.direction else "@none", term)
        elif ctx.direction is not None:
            entry["@language"].setdefault(default_ld, term)
            entry["@language"].setdefault("@none", term)
            entry["@type"].setdefault("@none", term)
        else:
            entry["@language"].setdefault((ctx.language or "@none").lower(),
                                          term)
            entry["@language"].setdefault("@none", term)
            entry["@type"].setdefault("@none", term)
    return inverse


def select_term(inverse: Dict[str, dict], var: str, containers: List[str],
                type_language: str, preferred: List[str]) -> Optional[str]:
    entry = inverse.get(var, {})
    for container in containers:
        if container not in entry:
            continue
        # type_language may itself be "@any" (empty-list case); "@any" as
        # a PREFERRED KEY matches only terms with @type: @none (the spec
        # puts a literal "@any" key in their maps)
        tl_map = entry[container].get(type_language, {})
        for pref in preferred:
            if pref in tl_map:
                return tl_map[pref]
    return None


# ---------------------------------------------------------------------------
# IRI / value compaction
# ---------------------------------------------------------------------------

_URI_RE = re.compile(
    r"^([^:/?#]+:)?(//[^/?#]*)?([^?#]*)(\?[^#]*)?(#.*)?$")


def _make_relative(base: str, iri: str) -> str:
    """Relative-IRI form of ``iri`` against ``base`` (compactToRelative):
    same scheme+authority → shared-directory-prefix path with ../ hops,
    else the IRI unchanged."""
    mb, mt = _URI_RE.match(base), _URI_RE.match(iri)
    if mb is None or mt is None:
        return iri
    b, t = [g or "" for g in mb.groups()], [g or "" for g in mt.groups()]
    if b[0] != t[0] or b[1] != t[1] or not b[0]:
        return iri
    if b[2] == t[2] and b[3] == t[3] and t[4]:
        return t[4]  # fragment-only reference
    if b[2] == t[2] and t[3]:
        return t[3] + t[4]  # query(+fragment)-only reference
    bdir = (b[2] or "/").split("/")[:-1]
    tpath = (t[2] or "/").split("/")
    i = 0
    while i < len(bdir) and i < len(tpath) - 1 and bdir[i] == tpath[i]:
        i += 1
    rel = "/".join([".."] * (len(bdir) - i) + tpath[i:])
    out = rel + t[3] + t[4]
    if not out:
        return iri
    # a relative reference must not LOOK like a keyword or an IRI: guard
    # leading '@' and colon-in-first-segment with ./ (w3c compact 0111)
    first_seg = out.split("/", 1)[0]
    if out.startswith("@") or ":" in first_seg:
        out = "./" + out
    return out


class Compactor:
    def __init__(self, ctx: _Ctx, expander: Expander,
                 compact_arrays: bool = True,
                 compact_to_relative: bool = True,
                 ordered: bool = True):
        self.expander = expander
        self.compact_arrays = compact_arrays
        self.compact_to_relative = compact_to_relative
        self.ordered = ordered
        self._inverse_cache: Dict[int, tuple] = {}

    def inverse(self, ctx: _Ctx) -> Dict[str, dict]:
        # hold a strong reference to ctx in the cache value: id() keys are
        # only unique among LIVE objects, so a collected context could let
        # a new one reuse its id and hit a stale inverse
        key = id(ctx)
        hit = self._inverse_cache.get(key)
        if hit is None or hit[0] is not ctx:
            hit = (ctx, create_inverse_context(ctx))
            self._inverse_cache[key] = hit
        return hit[1]

    # -- IRI compaction ---------------------------------------------------

    def compact_iri(self, ctx: _Ctx, var: Optional[str], value=None,
                    vocab: bool = False, reverse: bool = False
                    ) -> Optional[str]:
        if var is None:
            return None
        inverse = self.inverse(ctx)
        if vocab and var in inverse:
            default_ld = _default_lang_dir(ctx)
            containers: List[str] = []
            type_language = "@language"
            type_language_value = "@null"
            if isinstance(value, dict) and "@index" in value and \
                    "@graph" not in value:
                containers += ["@index", "@index@set"]
            if reverse:
                type_language = "@type"
                type_language_value = "@reverse"
                containers.append("@set")
            elif isinstance(value, dict) and "@list" in value:
                if "@index" not in value:
                    containers.append("@list")
                lst = value["@list"]
                common_type = common_lang = None
                if not lst:
                    common_lang = default_ld
                first = True
                for item in lst:
                    item_lang, item_type = "@none", "@none"
                    if isinstance(item, dict) and "@value" in item:
                        if "@direction" in item:
                            il = item.get("@language", "").lower()
                            item_lang = f"{il}_{item['@direction']}" if il \
                                else f"_{item['@direction']}"
                        elif "@language" in item:
                            item_lang = item["@language"].lower()
                        elif "@type" in item:
                            item_type = item["@type"]
                        else:
                            item_lang = "@null"
                    else:
                        item_type = "@id"
                    if first:
                        common_lang, common_type = item_lang, item_type
                        first = False
                    else:
                        if common_lang != item_lang:
                            common_lang = "@none"
                        if common_type != item_type:
                            common_type = "@none"
                    if common_lang == "@none" and common_type == "@none":
                        break
                common_lang = common_lang or "@none"
                common_type = common_type or "@none"
                if common_type != "@none":
                    type_language = "@type"
                    type_language_value = common_type
                else:
                    type_language_value = common_lang
            elif isinstance(value, dict) and "@graph" in value:
                if "@index" in value:
                    containers += ["@graph@index", "@graph@index@set"]
                if "@id" in value:
                    containers += ["@graph@id", "@graph@id@set"]
                containers += ["@graph", "@graph@set", "@set"]
                if "@index" not in value:
                    containers += ["@graph@index", "@graph@index@set"]
                if "@id" not in value:
                    containers += ["@graph@id", "@graph@id@set"]
                containers += ["@index", "@index@set"]
                type_language = "@type"
                type_language_value = "@id"
            else:
                if isinstance(value, dict) and "@value" in value:
                    if "@direction" in value and "@index" not in value:
                        vl = value.get("@language", "").lower()
                        type_language_value = \
                            f"{vl}_{value['@direction']}" if vl \
                            else f"_{value['@direction']}"
                        containers += ["@language", "@language@set"]
                    elif "@language" in value and "@index" not in value:
                        type_language_value = value["@language"].lower()
                        containers += ["@language", "@language@set"]
                    elif "@type" in value:
                        type_language = "@type"
                        type_language_value = value["@type"]
                else:
                    type_language = "@type"
                    type_language_value = "@id"
                    # container keys are the SORTED concatenation of the
                    # term's @container values — "@set@type", not
                    # "@type@set" (ts002)
                    containers += ["@id", "@id@set", "@type", "@set",
                                   "@set@type"]
                containers.append("@set")
            containers.append("@none")
            if not isinstance(value, dict) or "@index" not in value:
                containers += ["@index", "@index@set"]
            if isinstance(value, dict) and set(value) == {"@value"}:
                containers += ["@language", "@language@set"]
            type_language_value = type_language_value or "@null"
            preferred: List[str] = []
            if type_language_value == "@reverse":
                preferred.append("@reverse")
            if type_language_value in ("@id", "@reverse") and \
                    isinstance(value, dict) and "@id" in value:
                compacted = self.compact_iri(ctx, value["@id"], vocab=True)
                ctd = ctx.terms.get(compacted)
                if ctd is not None and ctd.iri == value["@id"]:
                    preferred += ["@vocab", "@id", "@none"]
                else:
                    preferred += ["@id", "@vocab", "@none"]
            else:
                preferred += [type_language_value, "@none"]
                if isinstance(value, dict) and "@list" in value and \
                        not value["@list"]:
                    type_language = "@any"
            preferred.append("@any")
            if "_" in (type_language_value or ""):
                preferred.append("_" +
                                 type_language_value.split("_", 1)[1])
            term = select_term(inverse, var, containers, type_language,
                               preferred)
            if term is not None:
                return term
        if vocab and ctx.vocab and var.startswith(ctx.vocab) and \
                len(var) > len(ctx.vocab):
            suffix = var[len(ctx.vocab):]
            std = ctx.terms.get(suffix)
            if std is None or std.iri == var:
                if std is None and suffix not in ctx.terms:
                    return suffix
                if std is not None and std.iri == var and value is None:
                    return suffix
        candidate = None
        for term, td in ctx.terms.items():
            if td is None or td.iri is None or not td.prefix_flag:
                continue
            if ":" in term:
                continue
            if not var.startswith(td.iri) or var == td.iri:
                continue
            cand = term + ":" + var[len(td.iri):]
            cand_td = ctx.terms.get(cand)
            ok = (cand_td is None) or (cand_td.iri == var and value is None)
            if ok and (candidate is None or
                       (len(cand), cand) < (len(candidate), candidate)):
                candidate = cand
        if candidate is not None:
            return candidate
        if ":" in var:
            scheme = var.split(":", 1)[0]
            std2 = ctx.terms.get(scheme)
            if std2 is not None and std2.prefix_flag and std2.iri and \
                    not var.startswith(std2.iri):
                # returning var as-is would read as a compact IRI of the
                # prefix term 'scheme' — ambiguous (w3c te002)
                raise ParseError("jsonld: IRI confused with prefix",
                                 code="ERR_PREFIX_CONFUSION")
        if not vocab and self.compact_to_relative and ctx.base:
            return _make_relative(ctx.base, var)
        return var

    # -- value compaction ---------------------------------------------------

    def compact_value(self, ctx: _Ctx, active_prop: Optional[str], value):
        td = ctx.terms.get(active_prop) if active_prop else None
        tm = td.type_mapping if td else None
        lang = td.language if td and td.language is not None \
            else ctx.language
        direction = td.direction if td and td.direction is not None \
            else ctx.direction
        n = len(value)
        if "@index" in value and td is not None and "@index" in td.container:
            n -= 1
        if n > 2:
            return self._expanded_value(ctx, value)
        if "@id" in value:
            if n == 1 and tm == "@id":
                return self.compact_iri(ctx, value["@id"])
            if n == 1 and tm == "@vocab":
                return self.compact_iri(ctx, value["@id"], vocab=True)
            return self._expanded_value(ctx, value)
        v = value.get("@value")
        if "@type" in value and value["@type"] == tm:
            return v
        if "@language" in value:
            vl = value["@language"].lower()
            vd = value.get("@direction")
            if n <= 2 and lang and vl == lang.lower() and \
                    (vd or None) == (direction or None):
                return v
            return self._expanded_value(ctx, value)
        if "@direction" in value:
            if (lang in (None, "")) and value["@direction"] == direction:
                return v
            return self._expanded_value(ctx, value)
        if "@type" not in value and n == 1:
            if not isinstance(v, str):
                if tm != "@none" or "@value" not in value:
                    return v
            elif not lang and not direction and tm is None:
                return v
            elif not lang and not direction and tm not in ("@id", "@vocab"):
                # a type mapping exists but the value is a plain string —
                # must stay expanded
                if tm is None:
                    return v
        return self._expanded_value(ctx, value)

    def _expanded_value(self, ctx: _Ctx, value) -> dict:
        out = {}
        for k, v in value.items():
            alias = self.compact_iri(ctx, k, vocab=True)
            if k == "@type":
                v = self.compact_iri(ctx, v, vocab=True) \
                    if isinstance(v, str) else \
                    [self.compact_iri(ctx, t, vocab=True) for t in v]
            elif k == "@id" and isinstance(v, str):
                v = self.compact_iri(ctx, v)
            out[alias] = v
        return out

    # -- the compaction algorithm -------------------------------------------

    def compact(self, ctx: _Ctx, active_prop: Optional[str], element,
                in_nest: bool = False):
        if element is None or isinstance(element, (str, int, float, bool)):
            return element
        td = ctx.terms.get(active_prop) if active_prop else None
        if isinstance(element, list):
            out = []
            for item in element:
                c = self.compact(ctx, active_prop, item)
                if c is not None:
                    out.append(c)
            if len(out) == 1 and self.compact_arrays and \
                    active_prop != "@graph" and \
                    (td is None or
                     not ({"@list", "@set"} & set(td.container))):
                return out[0]
            return out
        # type-scoped contexts of an ANCESTOR node do not propagate into
        # nested node objects (mirror of expansion's previous-context
        # mechanics; w3c compact c009) — but the active property's own
        # scoped context is looked up in the INCOMING context before the
        # revert (c013: a term defined only in the type-scoped context)
        node_ish = "@value" not in element and "@list" not in element and \
            set(element) != {"@id"}
        base_ctx = ctx.previous if (ctx.previous is not None and node_ish) \
            else ctx
        if td is not None and td.local_ctx is not _NO_CTX:
            lc = td.local_ctx
            ctx = self.expander.process_context(base_ctx, lc,
                                                override_protected=True)
            if any(isinstance(p, dict) and p.get("@propagate") is False
                   for p in (lc if isinstance(lc, list) else [lc])):
                # non-propagating property-scoped context: applies to the
                # immediate value, reverts below it (tc027)
                ctx.previous = base_ctx
        else:
            ctx = base_ctx
        td = ctx.terms.get(active_prop) if active_prop else None
        # inside a @list container, nested list objects collapse to plain
        # arrays (w3c compact li01-li05)
        if "@list" in element and set(element) <= {"@list", "@index"} and \
                td is not None and "@list" in td.container:
            inner = self.compact(ctx, active_prop, element["@list"])
            return inner if isinstance(inner, list) else [inner]
        if "@value" in element or (set(element) == {"@id"} and
                                   active_prop is not None):
            return self.compact_value(ctx, active_prop, element)
        inside_reverse = active_prop == "@reverse"
        result: Dict[str, Any] = {}
        # type-scoped contexts (sorted by compacted type term)
        pre_type_ctx = ctx  # @type values compact against the context
        # BEFORE type-scoping (tc014: a [null] scoped ctx must not hide
        # the type's own term)
        if "@type" in element:
            compacted_types = sorted(
                self.compact_iri(ctx, t, vocab=True)
                for t in element["@type"])
            propagate_any = False
            for ct in compacted_types:
                # each type's term definition comes from the ORIGINAL
                # context — a prior type's scoped [null, …] reset must not
                # hide it (tc018, mirroring expansion's c018 fix)
                ttd = pre_type_ctx.terms.get(ct) or ctx.terms.get(ct)
                if ttd is not None and ttd.local_ctx is not _NO_CTX:
                    ctx = self.expander.process_context(ctx, ttd.local_ctx)
                    lc = ttd.local_ctx
                    propagate_any = propagate_any or any(
                        isinstance(p, dict) and p.get("@propagate") is True
                        for p in (lc if isinstance(lc, list) else [lc]))
            if ctx is not pre_type_ctx and not propagate_any:
                # nested nodes revert to the FRAME's pre-type context, not
                # an intermediate type-scoped one (tc017)
                ctx.previous = pre_type_ctx
        for expanded_prop in sorted(element):
            expanded_value = element[expanded_prop]
            if expanded_prop == "@id":
                if expanded_value is None:
                    continue
                compacted = self.compact_iri(ctx, expanded_value)
                alias = self.compact_iri(ctx, "@id", vocab=True)
                result[alias] = compacted
                continue
            if expanded_prop == "@type":
                # values compact against the pre-type-scope context
                # (tc014) but the @type KEY aliases via the current one
                # (tc011: the scoped ctx may nullify the alias)
                types = [self.compact_iri(pre_type_ctx, t, vocab=True)
                         for t in expanded_value]
                alias = self.compact_iri(ctx, "@type", vocab=True)
                type_td = ctx.terms.get(alias)
                as_array = (not self.compact_arrays) or \
                    (type_td is not None and "@set" in type_td.container)
                result[alias] = types if (len(types) > 1 or as_array) \
                    else types[0]
                continue
            if expanded_prop == "@reverse":
                compacted = self.compact(ctx, "@reverse", expanded_value)
                if isinstance(compacted, dict):
                    for prop in list(compacted):
                        ptd = ctx.terms.get(prop)
                        if ptd is not None and ptd.reverse:
                            as_array = (not self.compact_arrays) or \
                                "@set" in ptd.container
                            v = compacted.pop(prop)
                            if as_array and not isinstance(v, list):
                                v = [v]
                            _merge_entry(result, prop, v)
                    if compacted:
                        alias = self.compact_iri(ctx, "@reverse", vocab=True)
                        result[alias] = compacted
                continue
            if expanded_prop == "@preserve":
                compacted = self.compact(ctx, active_prop,
                                         expanded_value)
                if compacted != []:
                    result["@preserve"] = compacted
                continue
            if expanded_prop == "@index":
                if td is not None and "@index" in td.container:
                    continue
                alias = self.compact_iri(ctx, "@index", vocab=True)
                result[alias] = expanded_value
                continue
            if expanded_prop in ("@direction", "@language", "@value"):
                alias = self.compact_iri(ctx, expanded_prop, vocab=True)
                result[alias] = expanded_value
                continue
            if expanded_prop == "@included":
                compacted = self.compact(ctx, "@included", expanded_value)
                alias = self.compact_iri(ctx, "@included", vocab=True)
                atd = ctx.terms.get(alias)
                as_array = (not self.compact_arrays) or \
                    (atd is not None and "@set" in atd.container)
                if as_array and not isinstance(compacted, list):
                    compacted = [compacted]
                result[alias] = compacted
                continue
            if expanded_prop == "@graph" and active_prop is None:
                compacted = self.compact(ctx, "@graph", expanded_value)
                alias = self.compact_iri(ctx, "@graph", vocab=True)
                result[alias] = compacted
                continue
            # empty array
            if expanded_value == []:
                item_prop = self.compact_iri(ctx, expanded_prop, value=None,
                                             vocab=True,
                                             reverse=inside_reverse)
                nest_result = self._nest_target(ctx, result, item_prop)
                _merge_entry(nest_result, item_prop, [], force_list=True)
                continue
            for item in expanded_value:
                item_prop = self.compact_iri(ctx, expanded_prop, item,
                                             vocab=True,
                                             reverse=inside_reverse)
                nest_result = self._nest_target(ctx, result, item_prop)
                itd = ctx.terms.get(item_prop)
                container = itd.container if itd else []
                as_array = (not self.compact_arrays) or "@set" in container \
                    or item_prop in ("@graph", "@list")
                if isinstance(item, dict) and "@list" in item:
                    compacted_item = self.compact(ctx, item_prop,
                                                  item["@list"])
                    if not isinstance(compacted_item, list):
                        compacted_item = [compacted_item]
                    if "@list" not in container:
                        wrapper = {self.compact_iri(ctx, "@list",
                                                    vocab=True):
                                   compacted_item}
                        if "@index" in item:
                            wrapper[self.compact_iri(ctx, "@index",
                                                     vocab=True)] = \
                                item["@index"]
                        compacted_item = wrapper
                        _merge_entry(nest_result, item_prop, compacted_item,
                                     force_list=as_array)
                    else:
                        nest_result[item_prop] = compacted_item
                    continue
                if isinstance(item, dict) and "@graph" in item:
                    self._compact_graph_item(ctx, nest_result, item_prop,
                                             item, container, as_array)
                    continue
                if "@language" in container or "@index" in container or \
                        "@id" in container or "@type" in container:
                    map_object = nest_result.setdefault(item_prop, {})
                    if "@language" in container:
                        term_dir = itd.direction if itd and \
                            itd.direction is not None else ctx.direction
                        plain = isinstance(item, dict) and \
                            "@value" in item and \
                            set(item) <= {"@value", "@language",
                                          "@direction"} and \
                            (item.get("@direction") or None) == \
                            (term_dir or None)
                        compacted_item = item["@value"] if plain \
                            else self.compact(ctx, item_prop, item)
                        key = item.get("@language", "@none") \
                            if isinstance(item, dict) else "@none"
                    elif "@index" in container:
                        if itd is not None and itd.index_prop is not None:
                            # property-based index: compact the FULL item,
                            # then pull the first value of the (compacted)
                            # index property out as the map key (tpi0x,
                            # t0114) — compacting first keeps node objects
                            # as objects
                            pi = self.expander.expand_iri(
                                ctx, itd.index_prop, vocab=True)
                            compacted_item = self.compact(ctx, item_prop,
                                                          item)
                            key = "@none"
                            if isinstance(compacted_item, dict):
                                # find the entry whose key re-expands to
                                # the index property (the per-value term
                                # choice may differ from a value-free
                                # compaction, t0114)
                                ckey = next(
                                    (k for k in compacted_item
                                     if not k.startswith("@") and
                                     self.expander.expand_iri(
                                         ctx, k, vocab=True) == pi),
                                    None)
                                vals = compacted_item.get(ckey) \
                                    if ckey is not None else None
                                lst = (vals if isinstance(vals, list)
                                       else [vals]) if vals is not None \
                                    else []
                                # only STRING values can be map keys; a
                                # node ref stays in place and the item
                                # files under @none (tpi06 vs t0114)
                                if lst and isinstance(lst[0], str):
                                    key = lst[0]
                                    rest = lst[1:]
                                    compacted_item = dict(compacted_item)
                                    if len(rest) > 1:
                                        compacted_item[ckey] = rest
                                    elif rest:
                                        compacted_item[ckey] = rest[0]
                                    else:
                                        del compacted_item[ckey]
                        else:
                            key = item.get("@index", "@none") \
                                if isinstance(item, dict) else "@none"
                            if isinstance(item, dict) and "@index" in item:
                                item = {k: v for k, v in item.items()
                                        if k != "@index"}
                            compacted_item = self.compact(ctx, item_prop,
                                                          item)
                    elif "@id" in container:
                        key = "@none"
                        if isinstance(item, dict) and "@id" in item:
                            key = self.compact_iri(ctx, item["@id"])
                            item = {k: v for k, v in item.items()
                                    if k != "@id"}
                        compacted_item = self.compact(ctx, item_prop, item)
                    else:  # @type map
                        key = "@none"
                        item_ctx = ctx
                        if isinstance(item, dict) and item.get("@type"):
                            types = list(item["@type"])
                            key = self.compact_iri(ctx, types[0], vocab=True)
                            rest = types[1:]
                            item = dict(item)
                            if rest:
                                item["@type"] = rest
                            else:
                                item.pop("@type")
                            # the map key's scoped context applies to the
                            # value (tm007, mirroring expansion c013)
                            ktd = ctx.terms.get(key)
                            if ktd is not None and \
                                    ktd.local_ctx is not _NO_CTX:
                                item_ctx = self.expander.process_context(
                                    ctx, ktd.local_ctx)
                        compacted_item = self.compact(item_ctx, item_prop,
                                                      item)
                        if isinstance(compacted_item, dict) and \
                                set(compacted_item) == {
                                    self.compact_iri(ctx, "@id",
                                                     vocab=True)}:
                            compacted_item = self.compact_iri(
                                ctx, item["@id"]) if "@id" in item else \
                                compacted_item
                    if key is None:
                        key = "@none"
                    key_alias = key
                    if key in ("@none",):
                        key_alias = self.compact_iri(ctx, "@none",
                                                     vocab=True)
                    map_as_array = (not self.compact_arrays) or \
                        "@set" in container
                    _merge_entry(map_object, key_alias, compacted_item,
                                 force_list=map_as_array)
                    continue
                compacted_item = self.compact(ctx, item_prop, item)
                _merge_entry(nest_result, item_prop, compacted_item,
                             force_list=as_array)
        return result

    def _nest_target(self, ctx: _Ctx, result: dict, item_prop: str) -> dict:
        itd = ctx.terms.get(item_prop)
        if itd is None or itd.nest is None:
            return result
        nest_term = itd.nest
        if nest_term != "@nest" and \
                self.expander.expand_iri(ctx, nest_term, vocab=True) \
                != "@nest":
            raise ParseError("jsonld: invalid @nest value")
        return result.setdefault(nest_term, {})

    def _compact_graph_item(self, ctx: _Ctx, nest_result: dict,
                            item_prop: str, item: dict,
                            container: List[str], as_array: bool) -> None:
        compacted_item = self.compact(ctx, item_prop, item["@graph"])
        graph_alias = self.compact_iri(ctx, "@graph", vocab=True)
        if "@graph" in container and "@id" in container:
            map_object = nest_result.setdefault(item_prop, {})
            key = self.compact_iri(ctx, item["@id"]) if "@id" in item \
                else self.compact_iri(ctx, "@none", vocab=True)
            _merge_entry(map_object, key, compacted_item,
                         force_list="@set" in container or
                         not self.compact_arrays)
        elif "@graph" in container and "@index" in container and \
                _is_simple_graph(item):
            map_object = nest_result.setdefault(item_prop, {})
            key = item.get("@index",
                           self.compact_iri(ctx, "@none", vocab=True))
            _merge_entry(map_object, key, compacted_item,
                         force_list="@set" in container or
                         not self.compact_arrays)
        elif "@graph" in container and _is_simple_graph(item):
            if isinstance(compacted_item, list) and len(compacted_item) > 1:
                # >1 node in a graph-container value: wrap under @included
                # so the nodes stay in ONE graph (w3c compact 0109)
                compacted_item = {
                    self.compact_iri(ctx, "@included", vocab=True):
                    compacted_item}
            _merge_entry(nest_result, item_prop, compacted_item,
                         force_list="@set" in container or
                         not self.compact_arrays)
        else:
            wrapper = {graph_alias: compacted_item}
            if "@id" in item:
                wrapper[self.compact_iri(ctx, "@id", vocab=True)] = \
                    self.compact_iri(ctx, item["@id"])
            if "@index" in item:
                wrapper[self.compact_iri(ctx, "@index", vocab=True)] = \
                    item["@index"]
            _merge_entry(nest_result, item_prop, wrapper,
                         force_list=as_array)


def _is_simple_graph(item: dict) -> bool:
    return "@value" not in item and "@id" not in item and \
        set(item) <= {"@graph", "@index"} and "@graph" in item


def _merge_entry(target: dict, key: str, value, force_list: bool = False
                 ) -> None:
    if key not in target:
        target[key] = [value] if force_list and not isinstance(value, list) \
            else value
        if force_list and not isinstance(target[key], list):
            target[key] = [target[key]]
        return
    existing = target[key]
    if not isinstance(existing, list):
        existing = [existing]
        target[key] = existing
    if isinstance(value, list):
        existing.extend(value)
    else:
        existing.append(value)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def compact(input_doc, context, base: str = "", loader=None,
            compact_arrays: bool = True, compact_to_relative: bool = True,
            ordered: bool = True,
            processing_mode: str = "json-ld-1.1") -> dict:
    """Spec Compaction (JSONLDProcessor.Compact analogue): expand the
    input, compact against ``context``, embed the context in the output."""
    expanded = input_doc if isinstance(input_doc, list) and all(
        isinstance(x, dict) and not x.get("@context") for x in input_doc) \
        and not isinstance(input_doc, str) else None
    if isinstance(input_doc, (str, dict)) or expanded is None:
        expanded = expand(input_doc, base=base, loader=loader,
                          processing_mode=processing_mode)
    ctx_value = context
    if isinstance(ctx_value, dict) and "@context" in ctx_value:
        ctx_value = ctx_value["@context"]
    expander = Expander(base, loader=loader,
                        processing_mode=processing_mode)
    ctx = expander.process_context(_Ctx(base), ctx_value)
    if not ctx.base and base:
        ctx.base = base
    compactor = Compactor(ctx, expander, compact_arrays=compact_arrays,
                          compact_to_relative=compact_to_relative,
                          ordered=ordered)
    result = compactor.compact(ctx, None, expanded)
    if isinstance(result, list):
        if not result:
            result = {}
        elif len(result) == 1 and compact_arrays:
            result = result[0]
        else:
            alias = compactor.compact_iri(ctx, "@graph", vocab=True)
            result = {alias: result}
    if not isinstance(result, dict):
        result = {} if result is None else result
    if ctx_value not in (None, {}, []):
        if isinstance(result, dict) and result:
            result = {"@context": ctx_value, **result}
        elif isinstance(result, dict):
            result = {}
    return result
