"""JSON-LD streaming-subset decoder tests.

The decoder intentionally covers the reference's *streaming* subset
(rdf/jsonld.go), not the full JSON-LD-API expansion algorithm the reference
delegates to json-gold (rdf/jsonld_api.go). Coverage here:
- a pinned whitelist of W3C toRdf cases the subset handles exactly
  (regression floor — must never shrink)
- unit tests for every subset feature incl. the reference's
  native-number → xsd:decimal quirk (rdf/jsonld_helpers.go:10-21)
"""

import glob
import os

import pytest

from rdf_go_spark.isomorphism import isomorphic
from rdf_go_spark.parsers.jsonld import parse_jsonld
from rdf_go_spark.parsers.ntriples import parse_document

TORDF = "/root/reference/w3c-tests/jsonld/toRdf"

# cases the streaming subset reproduces exactly (graph-isomorphic)
SUBSET_WHITELIST = [
    "0001-in.jsonld", "0002-in.jsonld", "0003-in.jsonld",
    "0004-in.jsonld", "0005-in.jsonld", "0006-in.jsonld",
    "0007-in.jsonld", "0008-in.jsonld", "0009-in.jsonld",
    "0010-in.jsonld", "0011-in.jsonld", "0012-in.jsonld",
    "0013-in.jsonld", "0014-in.jsonld", "0015-in.jsonld",
    "0016-in.jsonld", "0017-in.jsonld", "0018-in.jsonld",
    "0019-in.jsonld", "0020-in.jsonld", "0024-in.jsonld",
    "0025-in.jsonld", "0026-in.jsonld", "0028-in.jsonld",
    "0030-in.jsonld", "0032-in.jsonld", "0033-in.jsonld",
    "0034-in.jsonld", "0036-in.jsonld", "0113-in.jsonld",
    "0114-in.jsonld", "0115-in.jsonld", "0116-in.jsonld",
    "0120-in.jsonld", "0121-in.jsonld", "0122-in.jsonld",
    "0123-in.jsonld", "0124-in.jsonld", "0125-in.jsonld",
    "0126-in.jsonld", "0127-in.jsonld", "0128-in.jsonld",
    "0129-in.jsonld", "0130-in.jsonld", "0131-in.jsonld",
    "0132-in.jsonld", "c009-in.jsonld", "c027-in.jsonld",
    "c036-in.jsonld", "di01-in.jsonld", "di03-in.jsonld",
    "e001-in.jsonld", "e005-in.jsonld", "e007-in.jsonld",
    "e009-in.jsonld", "e011-in.jsonld", "e012-in.jsonld",
    "e015-in.jsonld", "e019-in.jsonld", "e020-in.jsonld",
    "e024-in.jsonld", "e025-in.jsonld", "e026-in.jsonld",
    "e028-in.jsonld", "e033-in.jsonld", "e040-in.jsonld",
    "e045-in.jsonld", "e050-in.jsonld", "e053-in.jsonld",
    "e054-in.jsonld", "e055-in.jsonld", "e057-in.jsonld",
    "e058-in.jsonld", "e069-in.jsonld", "e070-in.jsonld",
    "e071-in.jsonld", "e072-in.jsonld", "e073-in.jsonld",
    "e074-in.jsonld", "e113-in.jsonld", "e129-in.jsonld",
    "e130-in.jsonld", "li01-in.jsonld", "li02-in.jsonld",
    "li03-in.jsonld", "li04-in.jsonld", "p001-in.jsonld",
    "p002-in.jsonld", "p003-in.jsonld", "p004-in.jsonld",
    "pr02-in.jsonld", "pr10-in.jsonld", "pr13-in.jsonld",
    "pr14-in.jsonld", "pr15-in.jsonld", "pr24-in.jsonld",
    "pr34-in.jsonld", "pr35-in.jsonld", "pr37-in.jsonld",
    "pr39-in.jsonld", "pr41-in.jsonld", "so08-in.jsonld",
    "so09-in.jsonld", "so11-in.jsonld",
]


@pytest.mark.skipif(not os.path.isdir(TORDF), reason="W3C fixtures unavailable")
@pytest.mark.parametrize("name", SUBSET_WHITELIST)
def test_w3c_tordf_subset(name):
    src = open(os.path.join(TORDF, name), encoding="utf-8").read()
    exp_src = open(os.path.join(TORDF, name.replace("-in.jsonld", "-out.nq")),
                   encoding="utf-8").read()
    base = "https://w3c.github.io/json-ld-api/tests/toRdf/" + name
    got, errs = parse_jsonld(src, base=base)
    assert not errs, errs
    exp, eerrs = parse_document(exp_src, quads=True)
    assert not eerrs
    assert isomorphic(list(set(got)), list(set(exp)))


def _one(src, **kw):
    quads, errs = parse_jsonld(src, **kw)
    assert not errs, errs
    return quads


class TestSubsetSemantics:
    def test_basic_node(self):
        q = _one('{"@context":{"ex":"http://e/"},"@id":"ex:s","ex:p":"v"}')
        assert len(q) == 1
        assert str(q[0].s) == "<http://e/s>"
        assert str(q[0].p) == "<http://e/p>"
        assert str(q[0].o) == '"v"'

    def test_native_number_is_decimal_quirk(self):
        # rdf/jsonld_helpers.go:10-21: float → xsd:decimal (NOT xsd:double)
        q = _one('{"@context":{"ex":"http://e/"},"@id":"ex:s","ex:p":1.5}')
        assert str(q[0].o) == '"1.5"^^<http://www.w3.org/2001/XMLSchema#decimal>'

    def test_integral_number(self):
        q = _one('{"@context":{"ex":"http://e/"},"@id":"ex:s","ex:p":30}')
        assert str(q[0].o) == '"30"^^<http://www.w3.org/2001/XMLSchema#decimal>'

    def test_boolean(self):
        q = _one('{"@context":{"ex":"http://e/"},"@id":"ex:s","ex:p":true}')
        assert str(q[0].o) == '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'

    def test_type_and_vocab(self):
        q = _one('{"@context":{"@vocab":"http://v/"},"@id":"http://e/s",'
                 '"@type":["T1","T2"]}')
        types = sorted(str(x.o) for x in q)
        assert types == ["<http://v/T1>", "<http://v/T2>"]

    def test_value_object_lang_and_datatype(self):
        q = _one('{"@context":{"ex":"http://e/"},"@id":"ex:s",'
                 '"ex:a":{"@value":"chat","@language":"en"},'
                 '"ex:b":{"@value":"5","@type":"ex:dt"}}')
        objs = sorted(str(x.o) for x in q)
        assert objs == ['"5"^^<http://e/dt>', '"chat"@en']

    def test_list(self):
        q = _one('{"@context":{"ex":"http://e/"},"@id":"ex:s",'
                 '"ex:p":{"@list":[1,2]}}')
        preds = [str(x.p) for x in q]
        assert sum("first" in p for p in preds) == 2
        assert sum("rest" in p for p in preds) == 2

    def test_empty_list_is_nil(self):
        q = _one('{"@context":{"ex":"http://e/"},"@id":"ex:s",'
                 '"ex:p":{"@list":[]}}')
        assert str(q[0].o) == "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"

    def test_named_graph(self):
        q = _one('{"@context":{"ex":"http://e/"},"@id":"ex:g",'
                 '"@graph":[{"@id":"ex:s","ex:p":"v"}]}')
        assert str(q[0].g) == "<http://e/g>"

    def test_graph_before_context_buffered(self):
        # key order preserved by json.loads → @graph seen first
        q = _one('{"@graph":[{"@id":"ex:s","ex:p":"v"}],'
                 '"@context":{"ex":"http://e/"}}')
        assert str(q[0].s) == "<http://e/s>"

    def test_bnode_ids(self):
        q = _one('{"@context":{"ex":"http://e/"},"@id":"_:x","ex:p":{"@id":"_:y"}}')
        assert str(q[0].s) == "_:x" and str(q[0].o) == "_:y"

    def test_missing_id_gets_bnode(self):
        # spec behavior (default): fresh blank node subject
        q, errs = parse_jsonld('{"http://e/p":"v"}')
        assert not errs and str(q[0].s).startswith("_:")

    def test_missing_id_errors_in_strict_mode(self):
        # reference streaming-decoder behavior (rdf/jsonld.go:714-729)
        from rdf_go_spark.parsers.jsonld import JsonLdDecoder
        from rdf_go_spark.terms import ParseError
        import pytest as _pytest
        with _pytest.raises(ParseError):
            JsonLdDecoder(strict_ids=True).parse('{"http://e/p":"v"}')

    def test_invalid_json_errors(self):
        _, errs = parse_jsonld("{not json")
        assert errs

    def test_top_level_array(self):
        q = _one('[{"@context":{"ex":"http://e/"},"@id":"ex:a","ex:p":1},'
                 '{"@context":{"ex":"http://e/"},"@id":"ex:b","ex:p":2}]')
        assert len(q) == 2

    def test_term_definition(self):
        q = _one('{"@context":{"name":"http://xmlns.com/foaf/0.1/name"},'
                 '"@id":"http://e/s","name":"Alice"}')
        assert str(q[0].p) == "<http://xmlns.com/foaf/0.1/name>"
