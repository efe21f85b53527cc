"""Performance-regression thresholds (reference layer 5,
rdf/performance_regression_test.go). Floors are set ~5x below typical
measured throughput because the sandbox VM has bursty co-tenant noise;
they catch algorithmic regressions (accidental O(n²), lost fast path),
not micro-drift.

Typical single-core numbers on this box (2026-08): NT ~190k t/s (regex
fast path), Turtle ~35k, JSON-LD ~120k, RDF/XML ~25k.
"""

import time

import pytest

from rdf_go_spark.parsers.jsonld import parse_jsonld
from rdf_go_spark.parsers.ntriples import parse_document
from rdf_go_spark.parsers.rdfxml import parse_rdfxml
from rdf_go_spark.parsers.turtle import parse_turtle


def _throughput(fn, doc, n_expected):
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        stmts, errs = fn(doc)
        dt = time.perf_counter() - t0
        assert not errs and len(stmts) == n_expected
        best = max(best, len(stmts) / dt)
    return best


def test_ntriples_throughput_floor():
    doc = "\n".join(
        f'<http://e/s{i}> <http://e/p> "value {i}"@en .' for i in range(4000))
    assert _throughput(parse_document, doc, 4000) > 30000


def test_turtle_throughput_floor():
    doc = "@prefix e: <http://e/> .\n" + "\n".join(
        f'e:s{i} e:p "value {i}"@en, {i} .' for i in range(2000))
    assert _throughput(parse_turtle, doc, 4000) > 8000


def test_jsonld_throughput_floor():
    doc = ('{"@context":{"e":"http://e/"},"@graph":['
           + ",".join(f'{{"@id":"e:s{i}","e:p":"v{i}","e:q":{i}}}'
                      for i in range(2000)) + "]}")
    assert _throughput(parse_jsonld, doc, 4000) > 25000


def test_rdfxml_throughput_floor():
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xmlns:e="http://e/">'
           + "".join(f'<rdf:Description rdf:about="http://e/s{i}">'
                     f'<e:p>v{i}</e:p><e:q>w</e:q></rdf:Description>'
                     for i in range(2000)) + "</rdf:RDF>")
    assert _throughput(parse_rdfxml, doc, 4000) > 5000


def test_encode_throughput_floor():
    from rdf_go_spark.encoders import encode_ntriples
    from rdf_go_spark.terms import IRI, Literal, Quad
    quads = [Quad(IRI(f"http://e/s{i}"), IRI("http://e/p"),
                  Literal(f"value {i}", lang="en")) for i in range(5000)]
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = encode_ntriples(quads)
        best = max(best, len(quads) / (time.perf_counter() - t0))
    assert out.count("\n") == 5000
    assert best > 50000
