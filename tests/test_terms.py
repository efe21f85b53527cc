"""Term-kernel unit tests (no Spark). Parity anchors cited per case."""

import pytest

from rdf_go_spark.terms import (
    IRI, BlankNode, Literal, ParseError, Quad, TripleTerm,
    XSD_BOOLEAN, XSD_DECIMAL, XSD_DOUBLE, XSD_INTEGER, XSD_STRING,
    c14n_quote, classify_numeric, has_scheme, is_valid_lang_tag,
    make_literal, render_term, resolve_iri, unescape_string, validate_iri_strict,
)


class TestUnescape:
    def test_simple_escapes(self):
        # rdf/parse_utils.go:395-415
        assert unescape_string(r"a\nb\tc\rd\be\ff") == "a\nb\tc\rd\be\ff"
        assert unescape_string(r"\"\'\\") == "\"'\\"

    def test_unicode_escape(self):
        assert unescape_string(r"o") == "o"
        assert unescape_string(r"\U0000006F") == "o"

    def test_surrogate_pair(self):
        # rdf/parse_utils.go:443-457
        assert unescape_string(r"😀") == "\U0001F600"

    def test_lone_low_surrogate_rejected(self):
        with pytest.raises(ParseError):
            unescape_string(r"\uDC00")

    def test_high_surrogate_without_low_rejected(self):
        with pytest.raises(ParseError):
            unescape_string(r"\uD800x")

    def test_invalid_escape_rejected(self):
        # escape whitelist is exact (rdf/parse_utils.go:378)
        with pytest.raises(ParseError):
            unescape_string(r"\z")
        with pytest.raises(ParseError):
            unescape_string("trailing\\")

    def test_out_of_range_long_escape(self):
        with pytest.raises(ParseError):
            unescape_string(r"\U00110000")


class TestLangTag:
    def test_basic(self):
        assert is_valid_lang_tag("en")
        assert is_valid_lang_tag("en-US")
        assert is_valid_lang_tag("zh-Hant-TW")

    def test_rdf12_direction(self):
        # rdf/parse_utils.go:57-69
        assert is_valid_lang_tag("en--ltr")
        assert is_valid_lang_tag("ar--rtl")
        assert not is_valid_lang_tag("en--xyz")
        assert not is_valid_lang_tag("en--ltr--rtl")

    def test_invalid(self):
        assert not is_valid_lang_tag("")
        assert not is_valid_lang_tag("1abc")
        assert not is_valid_lang_tag("toolongprimary")
        assert not is_valid_lang_tag("en-")
        assert not is_valid_lang_tag("en-ü")


class TestIRI:
    def test_has_scheme(self):
        # rdf/ntriples.go:383-418
        assert has_scheme("http://example.org/x")
        assert has_scheme("urn:uuid:abc")
        assert has_scheme("a+b-c.d:rest")
        assert not has_scheme("//example.org/x")
        assert not has_scheme("relative/path")
        assert not has_scheme("/abs/path:colonlater")
        assert not has_scheme("#frag")

    def test_strict_validation(self):
        assert validate_iri_strict("http://e/ok") is None
        assert validate_iri_strict("http://e/ bad") is not None
        assert validate_iri_strict("http://e/<bad>") is not None
        assert validate_iri_strict("relative") is not None

    def test_resolve(self):
        # rdf/iri_resolve.go:9-44 (RFC 3986)
        assert resolve_iri("http://e/dir/", "x") == "http://e/dir/x"
        assert resolve_iri("http://e/dir/", "../y") == "http://e/y"
        assert resolve_iri("http://e/dir/", "http://other/z") == "http://other/z"
        assert resolve_iri("http://e/dir/doc", "#f") == "http://e/dir/doc#f"
        assert resolve_iri("", "rel") == "rel"


class TestNumericClassification:
    # rdf/turtle.go:588-673, rdf/turtle_lexer.go:409-419
    @pytest.mark.parametrize("tok,dt", [
        ("30", XSD_INTEGER), ("-5", XSD_INTEGER), ("+7", XSD_INTEGER),
        ("30.5", XSD_DECIMAL), ("-0.5", XSD_DECIMAL), (".5", XSD_DECIMAL),
        ("3e1", XSD_DOUBLE), ("3E-1", XSD_DOUBLE), ("1.2e3", XSD_DOUBLE),
        ("-.5e+2", XSD_DOUBLE),
    ])
    def test_valid(self, tok, dt):
        assert classify_numeric(tok) == dt

    @pytest.mark.parametrize("tok", ["", "+", "-", ".", "e5", "3e", "1.", "abc", "1..2"])
    def test_invalid(self, tok):
        assert classify_numeric(tok) is None


class TestRender:
    def test_c14n_quote_controls(self):
        # w3c-tests/ntriples/c14n/literal_all_controls-c14n.nt
        assert c14n_quote("\x00\x07\x0b") == '"\\u0000\\u0007\\u000B"'
        assert c14n_quote("\b\t\n\r\f") == '"\\b\\t\\n\\r\\f"'
        assert c14n_quote('x"y\\z') == '"x\\"y\\\\z"'
        assert c14n_quote("\x7f￾￿") == '"\\u007F\\uFFFE\\uFFFF"'
        assert c14n_quote("\x80࿿") == '"\x80࿿"'  # kept raw

    def test_render_literal(self):
        assert render_term(Literal("chat", lang="EN")) == '"chat"@en'
        assert render_term(Literal("chat", lang="en--ltr")) == '"chat"@en--ltr'
        assert render_term(Literal("foo", datatype=XSD_STRING)) == '"foo"'
        assert render_term(Literal("1", datatype=XSD_INTEGER)) == \
            '"1"^^<http://www.w3.org/2001/XMLSchema#integer>'

    def test_render_triple_term(self):
        tt = TripleTerm(IRI("http://e/s"), IRI("http://e/p"), Literal("o"))
        assert render_term(tt) == '<<( <http://e/s> <http://e/p> "o" )>>'
        nested = TripleTerm(IRI("http://e/s"), IRI("http://e/p"), tt)
        assert render_term(nested) == \
            '<<( <http://e/s> <http://e/p> <<( <http://e/s> <http://e/p> "o" )>> )>>'

    def test_render_bnode(self):
        assert render_term(BlankNode("b1")) == "_:b1"


class TestMakeLiteral:
    def test_lang_xor_datatype(self):
        # rdf/turtle.go:874-876
        with pytest.raises(ParseError):
            make_literal("x", datatype=XSD_STRING, lang="en")

    def test_forbidden_datatypes(self):
        # rdf/ntriples.go:539-543
        with pytest.raises(ParseError):
            make_literal("x", datatype="http://www.w3.org/1999/02/22-rdf-syntax-ns#langString")
