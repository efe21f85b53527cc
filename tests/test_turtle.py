"""Turtle parser conformance: full W3C turtle suites (main + eval + syntax),
positive/negative/eval-isomorphism."""

import os

import pytest

from rdf_go_spark.parsers.turtle import parse_turtle
from tests.w3c_harness import check_case, collect, is_legacy

ALL = (collect("turtle", ".ttl") + collect("turtle/eval", ".ttl")
       + collect("turtle/syntax", ".ttl"))
CASES = [p for p in ALL
         if not ("bad" in os.path.basename(p) and is_legacy(os.path.basename(p)))]


def _parse(src, base):
    return parse_turtle(src, base=base)


@pytest.mark.skipif(not CASES, reason="W3C fixtures unavailable")
@pytest.mark.parametrize("path", CASES, ids=lambda p: os.path.relpath(
    p, "/root/reference/w3c-tests"))
def test_w3c_turtle(path):
    failure = check_case(path, _parse)
    assert failure is None, failure


class TestTurtleUnits:
    def test_prefix_and_a(self):
        stmts, errs = parse_turtle(
            "@prefix ex: <http://e/> . ex:s a ex:T .")
        assert not errs
        assert str(stmts[0].p) == "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

    def test_numeric_datatypes(self):
        stmts, errs = parse_turtle(
            "@prefix ex: <http://e/> . ex:s ex:p 30, 30.5, 3e1, true .")
        assert not errs
        objs = [str(q.o) for q in stmts]
        assert objs == [
            '"30"^^<http://www.w3.org/2001/XMLSchema#integer>',
            '"30.5"^^<http://www.w3.org/2001/XMLSchema#decimal>',
            '"3e1"^^<http://www.w3.org/2001/XMLSchema#double>',
            '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>',
        ]

    def test_collection(self):
        stmts, errs = parse_turtle(
            "@prefix ex: <http://e/> . ex:s ex:p (1 2) .")
        assert not errs
        preds = sorted(str(q.p) for q in stmts)
        assert any("first" in p for p in preds)
        assert any("rest" in p for p in preds)

    def test_undefined_prefix_errors(self):
        stmts, errs = parse_turtle("ex:s ex:p ex:o .")
        assert errs

    def test_annotation_reifier_semantics(self):
        stmts, errs = parse_turtle(
            "@prefix ex: <http://e/> . ex:s ex:p ex:o {| ex:r ex:z |} .")
        assert not errs
        assert len(stmts) == 3  # asserted + reifies + annotation
        reifies = [q for q in stmts if "reifies" in str(q.p)]
        assert len(reifies) == 1

    def test_bnode_factory_injection(self):
        """Pipeline skolemization hook: deterministic labels."""
        from rdf_go_spark.terms import BlankNode
        seq = [0]

        def factory():
            seq[0] += 1
            return BlankNode(f"skolem{seq[0]}")

        stmts, errs = parse_turtle(
            "@prefix ex: <http://e/> . [ ex:p ex:o ] ex:q ex:r .",
            bnode_factory=factory)
        assert not errs
        assert any("_:skolem1" in str(q.s) for q in stmts)
