"""Fuzz layer (reference layer 4, rdf/fuzz_decode_test.go): parsers must
never raise anything but the quarantine contract on arbitrary input —
no crashes, no hangs, no foreign exceptions."""

import pytest
from hypothesis import given, settings, strategies as st

from rdf_go_spark.parsers.detect import detect_format, parse_any
from rdf_go_spark.parsers.jsonld import parse_jsonld
from rdf_go_spark.parsers.ntriples import parse_document
from rdf_go_spark.parsers.rdfxml import parse_rdfxml
from rdf_go_spark.parsers.trig import parse_trig
from rdf_go_spark.parsers.turtle import parse_turtle

TEXT = st.text(max_size=400)
RDFISH = st.text(
    alphabet=st.sampled_from(list(
        "<>\"'@._:;,(){}[]|^~#\\ \t\n\rabceghilmnoprstux0123456789éא𐀀")),
    max_size=300)


@settings(max_examples=200, deadline=None)
@given(TEXT | RDFISH)
def test_fuzz_ntriples(s):
    stmts, errs = parse_document(s)
    assert isinstance(stmts, list) and isinstance(errs, list)


@settings(max_examples=200, deadline=None)
@given(TEXT | RDFISH)
def test_fuzz_nquads(s):
    parse_document(s, quads=True)


@settings(max_examples=200, deadline=None)
@given(TEXT | RDFISH)
def test_fuzz_turtle(s):
    stmts, errs = parse_turtle(s)
    assert isinstance(stmts, list)


@settings(max_examples=200, deadline=None)
@given(TEXT | RDFISH)
def test_fuzz_trig(s):
    parse_trig(s)


@settings(max_examples=150, deadline=None)
@given(TEXT | RDFISH)
def test_fuzz_jsonld(s):
    parse_jsonld(s)


@settings(max_examples=150, deadline=None)
@given(TEXT | RDFISH)
def test_fuzz_rdfxml(s):
    parse_rdfxml(s)


@settings(max_examples=150, deadline=None)
@given(TEXT | RDFISH)
def test_fuzz_detect_and_parse_any(s):
    fmt = detect_format(s)
    assert fmt in (None, "turtle", "trig", "ntriples", "nquads",
                   "rdfxml", "jsonld")
    stmts, errs, used = parse_any(s)
    assert isinstance(stmts, list)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=120))
def test_fuzz_unescape_never_foreign_exceptions(s):
    from rdf_go_spark.terms import ParseError, unescape_string
    try:
        unescape_string(s)
    except ParseError:
        pass  # the only allowed failure


def test_deep_nesting_is_bounded():
    """MaxDepth guard (rdf/decoder_options.go): deeply nested structures
    must error, not blow the stack."""
    deep_ttl = "@prefix e: <http://e/> . e:s e:p " + "[ e:q " * 300 + \
        "e:o" + " ]" * 300 + " ."
    stmts, errs = parse_turtle(deep_ttl)
    assert errs and errs[0].code in ("ERR_DEPTH", "ERR_SYNTAX")

    deep_star = "@prefix e: <http://e/> . " + "<< " * 200 + \
        "e:s e:p e:o" + " >>" * 200 + " e:q e:r ."
    stmts, errs = parse_turtle(deep_star)
    assert errs

    deep_json = '{"@id":"http://e/s","@graph":' * 150 + "{}" + "}" * 150
    stmts, errs = parse_jsonld(deep_json)
    assert errs


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_fuzz_html_jsonld_extraction(s):
    """Arbitrary HTML-ish garbage must produce a value or a ParseError —
    never an unhandled crash."""
    from rdf_go_spark.parsers.html_jsonld import extract_html_jsonld
    from rdf_go_spark.terms import ParseError
    for kwargs in ({}, {"extract_all_scripts": True}, {"fragment": "x"}):
        try:
            extract_html_jsonld(s, **kwargs)
        except ParseError:
            pass


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_fuzz_cg_star_mode(s):
    """CG star semantics: same crash-safety contract as the default."""
    stmts, errs = parse_turtle(s, star_semantics="cg")
    assert isinstance(stmts, list) and isinstance(errs, list)


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_fuzz_media_decoders(b):
    """Random bytes into the media header decoders: a tuple or None,
    never a crash (the box walker must respect every bounds check)."""
    from rdf_go_spark.operators.multimodal import (
        _decode_mp4, _decode_png, _decode_wav, _find_box,
    )
    for fn in (_decode_mp4, _decode_png, _decode_wav):
        out = fn(b)
        assert out is None or (isinstance(out, tuple) and len(out) == 2)
    _find_box(b, 0, len(b), b"mdat")


@given(st.binary(max_size=128))
@settings(max_examples=100, deadline=None)
def test_fuzz_mp4_with_valid_prefix(tail):
    """A valid ftyp header followed by garbage boxes must stay safe."""
    from rdf_go_spark.operators.multimodal import _decode_mp4
    b = bytes.fromhex("0000001066747970") + b"isom\x00\x00\x02\x00" + tail
    out = _decode_mp4(b)
    assert out is None or isinstance(out, tuple)


SPARQLISH = st.text(
    alphabet=st.sampled_from(list(
        "SELECTWHERFILTANGOUPBYMINUSVALGRAPHDESCRIBEASK"
        "?<>\"'@._:;,(){}[]|^+*!=  \t\nabcdevx0123456789#")),
    max_size=300)


@settings(max_examples=200, deadline=None)
@given(TEXT | SPARQLISH)
def test_fuzz_sparql_parser(s):
    """The SPARQL parser must reject arbitrary input with SparqlError
    only — no crashes, no foreign exceptions (the paths/query layers
    raise ValueError subclasses by contract)."""
    from rdf_go_spark.operators.sparql import SparqlError, parse_sparql
    try:
        parse_sparql(s)
    except SparqlError:
        pass


@settings(max_examples=200, deadline=None)
@given(TEXT | SPARQLISH)
def test_fuzz_path_parser(s):
    from rdf_go_spark.operators.paths import parse_path
    try:
        parse_path(s)
    except ValueError:
        pass
