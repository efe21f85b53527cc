"""JSON-LD full processor (expansion + spec ToRDF) — manifest-driven
against the W3C json-ld-api toRdf suite with per-test options (base,
expandContext, rdfDirection). Reference analogue: JSONLDProcessor backed
by json-gold (rdf/jsonld_api.go:73-181).

Floors: toRdf 340/340 and expand 273/273 as of round 2 (full parity with
the reference's json-gold pass); the assertion allows a 1-2 case buffer so
an environment quirk doesn't mask an unrelated failure, and failures print
the deltas.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from rdf_go_spark.isomorphism import isomorphic
from rdf_go_spark.parsers.jsonld_full import expand, to_rdf
from rdf_go_spark.parsers.ntriples import parse_document

TORDF = "/root/reference/w3c-tests/jsonld/toRdf"
MANIFEST = "/root/reference/w3c-tests/jsonld/toRdf-manifest.jsonld"

PASS_FLOOR = 339


_URL_PREFIX = "https://w3c.github.io/json-ld-api/tests/toRdf/"


def _local_loader(url):
    """DocumentLoader analogue: resolve remote-context/@import URLs to the
    local fixture directory (incl. subdirectories, w3c c031)."""
    rel = url[len(_URL_PREFIX):] if url.startswith(_URL_PREFIX) \
        else url.split("/")[-1]
    return json.load(open(os.path.join(TORDF, rel)))


@pytest.mark.skipif(not os.path.exists(MANIFEST), reason="manifest unavailable")
def test_w3c_tordf_manifest_floor():
    man = json.load(open(MANIFEST))
    opts = {e["input"].split("/")[-1]: e.get("option", {})
            for e in man["sequence"]}
    ok = total = 0
    failures = []
    for f in sorted(glob.glob(f"{TORDF}/*-in.jsonld")):
        ep = f.replace("-in.jsonld", "-out.nq")
        if not os.path.exists(ep):
            continue
        name = os.path.basename(f)
        o = opts.get(name, {})
        if o.get("specVersion") == "json-ld-1.0":
            continue  # 1.0-only expectations conflict with 1.1 processing
        total += 1
        base = o.get("base",
                     "https://w3c.github.io/json-ld-api/tests/toRdf/" + name)
        ec = None
        if "expandContext" in o:
            ecp = os.path.join(TORDF, o["expandContext"].split("/")[-1])
            if os.path.exists(ecp):
                ec = json.load(open(ecp))
        try:
            got, errs = to_rdf(open(f).read(), base=base, expand_context=ec,
                               rdf_direction=o.get("rdfDirection"),
                               loader=_local_loader,
                               generalized=o.get("produceGeneralizedRdf",
                                                 False))
            if errs:
                failures.append((name, str(errs[0])[:60]))
                continue
            exp, eerrs = parse_document(
                open(ep).read(), quads=True,
                generalized=o.get("produceGeneralizedRdf", False))
            if eerrs:
                continue
            if isomorphic(list(set(got)), list(set(exp))):
                ok += 1
            else:
                failures.append((name, "mismatch"))
        except Exception as ex:  # noqa: BLE001 — counted, not fatal
            failures.append((name, type(ex).__name__))
    assert ok >= PASS_FLOOR, (
        f"full-processor toRdf regressed: {ok}/{total} "
        f"(floor {PASS_FLOOR}); first failures: {failures[:10]}")


class TestFullProcessorUnits:
    def test_spec_numerics_differ_from_streaming_quirk(self):
        """The full processor uses spec numerics (integer / canonical
        double); the streaming decoder keeps the reference's decimal
        quirk — both on the same input."""
        from rdf_go_spark.parsers.jsonld import parse_jsonld
        doc = '{"@id":"http://e/s","http://e/p":[30, 1.5]}'
        full, _ = to_rdf(doc)
        stream, _ = parse_jsonld(doc)
        full_objs = sorted(str(q.o) for q in full)
        stream_objs = sorted(str(q.o) for q in stream)
        assert full_objs == [
            '"1.5E0"^^<http://www.w3.org/2001/XMLSchema#double>',
            '"30"^^<http://www.w3.org/2001/XMLSchema#integer>']
        assert stream_objs == [
            '"1.5"^^<http://www.w3.org/2001/XMLSchema#decimal>',
            '"30"^^<http://www.w3.org/2001/XMLSchema#decimal>']

    def test_expand_basic(self):
        out = expand('{"@context":{"name":"http://xmlns.com/foaf/0.1/name"},'
                     '"@id":"http://e/s","name":"x"}')
        assert out == [{"@id": "http://e/s",
                        "http://xmlns.com/foaf/0.1/name": [{"@value": "x"}]}]

    def test_rdf_json_literal_uses_jcs(self):
        doc = ('{"@id":"http://e/s","http://e/p":'
               '{"@value":{"b":2,"a":1},"@type":"@json"}}')
        quads, errs = to_rdf(doc)
        assert not errs
        assert quads[0].o.lexical == '{"a":1,"b":2}'
        assert quads[0].o.datatype.endswith("#JSON")

    def test_nested_lists(self):
        doc = ('{"@context":{"foo":{"@id":"http://e/foo",'
               '"@container":"@list"}},"foo":[["baz"]]}')
        quads, errs = to_rdf(doc)
        assert not errs
        firsts = [q for q in quads if str(q.p).endswith("first>")]
        assert len(firsts) == 2  # outer list node + inner list node

    def test_graph_container(self):
        doc = ('{"@context":{"input":{"@id":"http://e/input",'
               '"@container":"@graph"}},"input":{"http://e/v":"x"}}')
        quads, errs = to_rdf(doc)
        assert not errs
        assert any(q.g is not None for q in quads)


EXPAND_MANIFEST = "/root/reference/w3c-tests/jsonld/expand-manifest.jsonld"
EXPAND_FLOOR = 271


@pytest.mark.skipif(not os.path.exists(EXPAND_MANIFEST),
                    reason="manifest unavailable")
def test_w3c_expand_manifest_floor():
    """Expansion algorithm vs the W3C expand suite, compared structurally
    (dict keys unordered, sibling arrays compared as multisets)."""
    man = json.load(open(EXPAND_MANIFEST))
    opts = {e["input"].split("/")[-1]: e.get("option", {})
            for e in man["sequence"] if "input" in e}
    root = "/root/reference/w3c-tests/jsonld/expand"
    url_prefix = "https://w3c.github.io/json-ld-api/tests/expand/"

    def loader(url):
        rel = url[len(url_prefix):] if url.startswith(url_prefix) \
            else url.split("/")[-1]
        return json.load(open(os.path.join(root, rel)))

    def norm(x):
        if isinstance(x, dict):
            return {k: norm(v) for k, v in x.items()}
        if isinstance(x, list):
            return sorted(json.dumps(norm(v), sort_keys=True) for v in x)
        return x

    ok = total = 0
    for f in sorted(glob.glob(root + "/*-in.jsonld")):
        name = os.path.basename(f)
        o = opts.get(name, {})
        if o.get("specVersion") == "json-ld-1.0":
            continue
        ep = f.replace("-in.jsonld", "-out.jsonld")
        if not os.path.exists(ep):
            continue
        total += 1
        base = o.get("base",
                     "https://w3c.github.io/json-ld-api/tests/expand/" + name)
        ec = None
        if "expandContext" in o:
            ecp = os.path.join(root, o["expandContext"].split("/")[-1])
            if os.path.exists(ecp):
                ec = json.load(open(ecp))
        try:
            got = expand(open(f).read(), base=base, expand_context=ec,
                         loader=loader)
            if norm(got) == norm(json.load(open(ep))):
                ok += 1
        except Exception:  # noqa: BLE001 — counted
            pass
    assert ok >= EXPAND_FLOOR, f"expand suite regressed: {ok}/{total}"


FROMRDF = "/root/reference/w3c-tests/jsonld/fromRdf"
FROMRDF_MANIFEST = "/root/reference/w3c-tests/jsonld/fromRdf-manifest.jsonld"
FROMRDF_FLOOR = 49  # 50/50 of the 1.1 suite as of round 2


@pytest.mark.skipif(not os.path.exists(FROMRDF_MANIFEST),
                    reason="manifest unavailable")
def test_w3c_fromrdf_manifest_floor():
    """from_rdf (Serialize RDF as JSON-LD) vs the W3C fromRdf suite —
    direct output comparison with per-test options (useNativeTypes,
    useRdfType, rdfDirection). Reference analogue:
    JSONLDProcessor.FromRDF (rdf/jsonld_api.go:75)."""
    from rdf_go_spark.parsers.jsonld_full import from_rdf

    man = json.load(open(FROMRDF_MANIFEST))
    opts = {e["input"].split("/")[-1]: e.get("option", {})
            for e in man["sequence"] if "input" in e}

    def norm(x):
        if isinstance(x, dict):
            return {k: norm(v) for k, v in x.items()}
        if isinstance(x, list):
            return sorted(json.dumps(norm(v), sort_keys=True) for v in x)
        return x

    ok = total = 0
    failures = []
    for f in sorted(glob.glob(FROMRDF + "/*-in.nq")):
        ep = f.replace("-in.nq", "-out.jsonld")
        if not os.path.exists(ep):
            continue
        name = os.path.basename(f)
        o = opts.get(name, {})
        if o.get("specVersion") == "json-ld-1.0":
            continue  # 1.0 list-serialization rules conflict with 1.1
        total += 1
        quads, errs = parse_document(open(f).read(), quads=True)
        if errs:
            failures.append((name, "input parse"))
            continue
        try:
            got = from_rdf(quads,
                           use_native_types=o.get("useNativeTypes", False),
                           use_rdf_type=o.get("useRdfType", False),
                           rdf_direction=o.get("rdfDirection"))
            if norm(got) == norm(json.load(open(ep))):
                ok += 1
            else:
                failures.append((name, "mismatch"))
        except Exception as ex:  # noqa: BLE001 — counted
            failures.append((name, type(ex).__name__))
    assert ok >= FROMRDF_FLOOR, (
        f"fromRdf suite regressed: {ok}/{total}; first: {failures[:10]}")


@pytest.mark.skipif(not os.path.isdir(FROMRDF), reason="fixtures unavailable")
def test_fromrdf_encoder_differential_roundtrip():
    """Differential: OUR JSON-LD encoder's output for each fixture graph
    must deserialize (via our full processor) back to the same graph."""
    from rdf_go_spark.encoders import encode_jsonld

    enc_ok = 0
    for f in sorted(glob.glob(FROMRDF + "/*-in.nq")):
        quads, errs = parse_document(open(f).read(), quads=True)
        if errs:
            continue
        if all(q.g is None for q in quads):
            ours, e3 = to_rdf(encode_jsonld(quads))
            try:
                if not e3 and isomorphic(list(set(quads)), list(set(ours))):
                    enc_ok += 1
            except RecursionError:
                pass
    assert enc_ok >= 44, f"encoder round trip regressed: {enc_ok}"


class TestFromRdfUnits:
    def test_list_reassembly(self):
        from rdf_go_spark.parsers.jsonld_full import from_rdf
        quads, _ = parse_document(
            '<http://e/s> <http://e/p> _:l0 .\n'
            '_:l0 <' + 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first'
            + '> "a" .\n'
            '_:l0 <' + 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest'
            + '> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .\n')
        out = from_rdf(quads)
        assert out == [{"@id": "http://e/s",
                        "http://e/p": [{"@list": [{"@value": "a"}]}]}]

    def test_native_types_bool_int_distinct(self):
        # json round-trip must not merge {"@value": 1} into {"@value": true}
        from rdf_go_spark.parsers.jsonld_full import from_rdf
        nq = ('<http://e/s> <http://e/p> "true"^^'
              '<http://www.w3.org/2001/XMLSchema#boolean> .\n'
              '<http://e/s> <http://e/p> "1"^^'
              '<http://www.w3.org/2001/XMLSchema#integer> .\n')
        quads, _ = parse_document(nq)
        out = from_rdf(quads, use_native_types=True)
        vals = out[0]["http://e/p"]
        assert {"@value": True} in vals
        assert any(v == {"@value": 1} and
                   not isinstance(v["@value"], bool) for v in vals)

    def test_fromrdf_tordf_roundtrip(self):
        from rdf_go_spark.parsers.jsonld_full import from_rdf
        nq = ('<http://e/s> <http://e/p> "x"@en .\n'
              '<http://e/s> <http://e/q> _:b1 .\n'
              '_:b1 <http://e/r> "2"^^'
              '<http://www.w3.org/2001/XMLSchema#integer> .\n')
        quads, _ = parse_document(nq)
        back, errs = to_rdf(json.dumps(from_rdf(quads)))
        assert not errs
        assert isomorphic(list(set(quads)), list(set(back)))


class TestScopedContextSemantics:
    """Pinned corner semantics (each was a W3C-suite fix; floors alone
    wouldn't localize a regression)."""

    def test_alias_value_object_survives_revert(self):
        # c020: keyword alias from a type-scoped ctx makes the nested dict
        # a VALUE object — the revert guard must see through the alias
        doc = ('{"@context":{"@vocab":"http://example/","type":"@type",'
               '"Type":{"@context":{"value":"@value"}}},'
               '"type":"Type","v":{"value":"x","type":"dt"}}')
        quads, errs = to_rdf(doc)
        assert not errs
        lits = [q.o for q in quads if hasattr(q.o, "lexical")]
        assert any(o.lexical == "x" and o.datatype.endswith("/dt")
                   for o in lits)

    def test_propagate_false_property_ctx_applies_one_level(self):
        # so06 shape: scoped ctx applies to the immediate value, reverts
        # below
        doc = ('{"@context":{"@vocab":"http://example/",'
               '"bar":{"@context":{"@propagate":false,'
               '"baz":{"@id":"http://other/baz"}}}},'
               '"bar":{"baz":{"baz":"buzz"}}}')
        quads, errs = to_rdf(doc)
        assert not errs
        preds = sorted(str(q.p) for q in quads)
        assert "<http://other/baz>" in preds          # first level
        assert "<http://example/baz>" in preds        # reverted below

    def test_type_map_key_scoped_context(self):
        # c013 shape: @type-map keys apply their scoped contexts
        doc = ('{"@context":{"@vocab":"http://example/",'
               '"prop":{"@container":"@type"},'
               '"Inner":{"@context":{"foo":"http://inner/foo"}}},'
               '"prop":{"Inner":{"foo":"v"}}}')
        quads, errs = to_rdf(doc)
        assert not errs
        assert any(str(q.p) == "<http://inner/foo>" for q in quads)

    def test_compound_literal_direction(self):
        doc = ('{"@id":"http://e/s","http://e/p":'
               '{"@value":"x","@language":"ar","@direction":"rtl"}}')
        quads, errs = to_rdf(doc, rdf_direction="compound-literal")
        assert not errs
        preds = sorted(str(q.p) for q in quads)
        assert any(p.endswith("#direction>") for p in preds)
        assert any(p.endswith("#language>") for p in preds)

    def test_keyword_form_id_drops_node(self):
        doc = '{"@id":"http://e/s","http://e/p":{"@id":"@ignoreMe"}}'
        quads, errs = to_rdf(doc)
        assert not errs and quads == []

    def test_document_loader_import(self):
        def loader(url):
            assert url == "http://ctx.example/c.jsonld"
            return {"@context": {"imported": "http://imported/p"}}
        doc = ('{"@context":{"@import":"http://ctx.example/c.jsonld"},'
               '"@id":"http://e/s","imported":"v"}')
        quads, errs = to_rdf(doc, loader=loader)
        assert not errs
        assert str(quads[0].p) == "<http://imported/p>"


REMOTE_DOC = "/root/reference/w3c-tests/json-ld-tests/remote-doc"
_RD_PREFIX = "https://w3c.github.io/json-ld-api/tests/"


@pytest.mark.skipif(not os.path.isdir(REMOTE_DOC),
                    reason="fixtures unavailable")
class TestDocumentLoaderRemoteDoc:
    """DocumentLoader end-to-end over the W3C remote-doc suite's
    loader-expressible cases: a document retrieved BY IRI through the
    hook, expanded against its own base. Scope note: the suite's
    HTTP-protocol cases (3xx redirects, Link-header context injection,
    content-type negotiation) test the transport layer, which in this
    engine is Spark's file source, not an HTTP client — a DocumentLoader
    receives an IRI and returns parsed JSON, so only retrieval-by-IRI
    semantics apply (same scope the reference's DocumentLoader interface
    has, rdf/jsonld_api.go:60-62)."""

    @staticmethod
    def _rd_loader(url):
        assert url.startswith(_RD_PREFIX + "remote-doc/")
        return json.load(open(os.path.join(
            REMOTE_DOC, url[len(_RD_PREFIX + "remote-doc/"):])))

    @pytest.mark.parametrize("name", ["0001-in.jsonld", "0002-in.json"])
    def test_expand_document_retrieved_by_iri(self, name):
        from rdf_go_spark.parsers.jsonld_full import expand
        url = _RD_PREFIX + "remote-doc/" + name
        doc = self._rd_loader(url)
        got = expand(doc, base=url, loader=self._rd_loader)
        want = json.load(open(os.path.join(
            REMOTE_DOC, name.split("-in")[0] + "-out.jsonld")))
        assert got == want

    def test_chained_remote_contexts_through_loader(self):
        """Multi-document context graph: the document references context
        A by IRI; A @imports B; B defines the term — the loader is
        invoked once per document and the definitions compose."""
        from rdf_go_spark.parsers.jsonld_full import to_rdf
        calls = []

        def loader(url):
            calls.append(url)
            return {
                "http://ctx.example/a.jsonld": {
                    "@context": {"@version": 1.1,
                                 "@import": "http://ctx.example/b.jsonld",
                                 "p2": "http://e/p2"}},
                "http://ctx.example/b.jsonld": {
                    "@context": {"p1": "http://e/p1"}},
            }[url]

        doc = ('{"@context":"http://ctx.example/a.jsonld",'
               '"@id":"http://e/s","p1":"v1","p2":"v2"}')
        quads, errs = to_rdf(doc, loader=loader)
        assert not errs
        assert calls == ["http://ctx.example/a.jsonld",
                        "http://ctx.example/b.jsonld"]
        preds = sorted(str(q.p) for q in quads)
        assert preds == ["<http://e/p1>", "<http://e/p2>"]
