"""Canonicalization stage + sorted bnode relabeling tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SMOKE = "/root/testdata/sf0.001"


class TestCanonicalizeStage:
    def test_idempotent_on_pipeline_output(self, spark):
        from rdf_go_spark.operators.canonicalize import (
            canonical_only, canonicalize_triples,
        )
        from rdf_go_spark.plans.pipeline import kg_triples
        t = kg_triples(spark, SMOKE)
        c1 = canonical_only(canonicalize_triples(t))
        assert sorted(map(tuple, c1.collect())) == \
            sorted(map(tuple, t.collect()))

    def test_normalizes_external_forms(self, spark):
        """Uppercase lang tags, xsd:string datatypes, and escape variants
        collapse to canonical form."""
        from rdf_go_spark.operators.canonicalize import (
            canonical_only, canonicalize_triples,
        )
        rows = [
            ("<http://e/s>", "<http://e/p>", '"chat"@EN', None, "c", 0),
            ("<http://e/s>", "<http://e/p>",
             '"x"^^<http://www.w3.org/2001/XMLSchema#string>', None, "c", 1),
            ("<http://e/s>", "<http://e/p>", '"\\u0041"', None, "c", 2),
        ]
        df = spark.createDataFrame(
            rows, "subj string, pred string, obj string, graph string, "
                  "conv_id string, turn_idx int")
        got = {r.turn_idx: r.obj
               for r in canonical_only(canonicalize_triples(df)).collect()}
        assert got[0] == '"chat"@en'
        assert got[1] == '"x"'
        assert got[2] == '"A"'

    def test_bad_terms_quarantined(self, spark):
        from rdf_go_spark.operators.canonicalize import canonicalize_triples
        rows = [("<relative>", "<http://e/p>", '"v"', None, "c", 0),
                ("<http://e/s>", "<http://e/p>", '"v"', None, "c", 1)]
        df = spark.createDataFrame(
            rows, "subj string, pred string, obj string, graph string, "
                  "conv_id string, turn_idx int")
        out = canonicalize_triples(df)
        assert out.filter(F.col("error_code").isNotNull()).count() == 1
        assert out.filter(F.col("error_code").isNull()).count() == 1


class TestCanonicalLabels:
    def test_relabel_stability(self):
        from rdf_go_spark.isomorphism import canonical_labels, relabel
        from rdf_go_spark.parsers.turtle import parse_turtle
        src = ("@prefix e: <http://e/> . "
               "_:x e:p e:a . _:y e:p e:b . _:x e:q _:y .")
        g1, _ = parse_turtle(src)
        # same graph with permuted labels
        src2 = src.replace("_:x", "_:tmp").replace("_:y", "_:x") \
            .replace("_:tmp", "_:y")
        g2, _ = parse_turtle(src2)
        r1 = relabel(g1, canonical_labels(g1))
        r2 = relabel(g2, canonical_labels(g2))
        assert r1 == r2

    def test_pr_scoring_up_to_relabeling(self):
        """The P/R comparison path for graphs with fresh bnodes."""
        from rdf_go_spark.isomorphism import canonical_labels, relabel
        from rdf_go_spark.parsers.jsonld import parse_jsonld
        doc = '{"@context":{"e":"http://e/"},"e:p":{"e:q":"v"}}'
        a, _ = parse_jsonld(doc)
        b, _ = parse_jsonld(doc)  # fresh decoder → different bnode ids? same
        ra = set(relabel(a, canonical_labels(a)))
        rb = set(relabel(b, canonical_labels(b)))
        tp = len(ra & rb)
        assert tp / len(ra) == 1.0 and tp / len(rb) == 1.0


class TestAdviceRegressions:
    """Pinned fixes from the round-1 advisory review."""

    def test_labeled_bnodes_skolemize_per_document(self):
        # same _:b0 label in two docs must NOT collide after parse_any
        # with a per-doc factory (cross-document union safety)
        from rdf_go_spark.operators.parse_spark import _skolem_factory
        from rdf_go_spark.parsers.detect import parse_any
        nt = '_:b0 <http://e/p> "x" .\n'
        s1, _, _ = parse_any(nt, fmt="nt", bnode_factory=_skolem_factory("A"))
        s2, _, _ = parse_any(nt, fmt="nt", bnode_factory=_skolem_factory("B"))
        assert s1[0].s != s2[0].s
        # and the same label within one doc stays one node
        nt2 = '_:b0 <http://e/p> _:b0 .\n_:b0 <http://e/q> "y" .\n'
        s3, _, _ = parse_any(nt2, fmt="nt",
                             bnode_factory=_skolem_factory("C"))
        assert s3[0].s == s3[0].o == s3[1].s

    def test_anonymous_bnodes_never_merge_with_labels(self):
        # round-2 advisory (high): parsing with bnode_factory used the
        # parsers' DEFAULT anon factory ('b1','b2',…) before relabeling,
        # so a document label _:b1 silently merged with an anonymous
        # [ … ] node. Anonymous ids now use a \x00 prefix no label
        # grammar admits.
        from rdf_go_spark.operators.parse_spark import _skolem_factory
        from rdf_go_spark.parsers.detect import parse_any

        ttl = ('<http://e/s> <http://e/p> _:b1 .\n'
               '<http://e/s2> <http://e/p> [ <http://e/q> "x" ] .\n')
        stmts, errs, fmt = parse_any(ttl, fmt="turtle",
                                     bnode_factory=_skolem_factory("D"))
        assert not errs and fmt == "turtle"
        bnodes = {q.o.id for q in stmts if hasattr(q.o, "id")} | \
                 {q.s.id for q in stmts if hasattr(q.s, "id")}
        # _:b1, the anonymous node, = 2 distinct nodes; \x00 never leaks
        assert len(bnodes) == 2
        assert all("\x00" not in b for b in bnodes)
        # same shape in JSON-LD (decoder-minted bnodes) and RDF/XML
        jld = ('{"@context":{"e":"http://e/"},"@graph":['
               '{"@id":"_:b1","e:p":"lbl"},{"e:p":{"e:q":"anon"}}]}')
        s2, e2, _ = parse_any(jld, fmt="jsonld",
                              bnode_factory=_skolem_factory("E"))
        assert not e2
        subj_bnodes = {q.s.id for q in s2 if hasattr(q.s, "id")}
        assert len(subj_bnodes) >= 3  # _:b1, outer anon, inner anon

    def test_turtle_datatyped_control_char_roundtrips(self):
        # \x0b in a datatyped literal abbreviated via a prefix: go_quote
        # \v is not a Turtle ECHAR — must use the c14n form
        from rdf_go_spark.encoders import encode_turtle
        from rdf_go_spark.parsers.turtle import parse_turtle
        from rdf_go_spark.terms import IRI, Literal, Quad
        q = Quad(IRI("http://e/s"), IRI("http://e/p"),
                 Literal("a\x0bb", datatype="http://e/dt"), None)
        text = encode_turtle([q], prefixes={"e": "http://e/"})
        stmts, errs = parse_turtle(text)
        assert not errs
        assert stmts[0].o.lexical == "a\x0bb"
        assert stmts[0].o.datatype == "http://e/dt"

    def test_jsonld_encoder_keeps_named_graphs(self):
        import json as _json
        from rdf_go_spark.encoders import encode_jsonld
        from rdf_go_spark.parsers.jsonld_full import to_rdf
        from rdf_go_spark.terms import IRI, Literal, Quad
        quads = [
            Quad(IRI("http://e/s"), IRI("http://e/p"), Literal("default"),
                 None),
            Quad(IRI("http://e/s"), IRI("http://e/p"), Literal("named"),
                 IRI("http://e/G")),
        ]
        doc = _json.loads(encode_jsonld(quads))
        graphs = [n for n in doc["@graph"] if "@graph" in n]
        assert graphs and graphs[0]["@id"] == "http://e/G"
        back, errs = to_rdf(encode_jsonld(quads))
        assert not errs
        assert sorted(str(q.g) for q in back) == ["<http://e/G>", "None"]

    def test_remote_context_loader_failure_raises(self):
        from rdf_go_spark.parsers.jsonld_full import to_rdf
        doc = ('{"@context":"http://missing.example/ctx.jsonld",'
               '"@id":"http://e/s","http://e/p":"x"}')

        def loader(url):
            raise IOError("boom")
        quads, errs = to_rdf(doc, loader=loader)
        assert errs and errs[0].code == "ERR_REMOTE_CONTEXT"

    def test_rdfc10_symmetric_bnode_cycle(self):
        # a 10-cycle of indistinguishable bnodes needs deep hash-n-degree
        # recursion; the old flat cap of 8 rejected it
        from rdf_go_spark.rdfc10 import canonicalize
        from rdf_go_spark.terms import BlankNode, IRI, Quad
        p = IRI("http://e/p")
        quads = [Quad(BlankNode(f"n{i}"), p, BlankNode(f"n{(i + 1) % 10}"),
                      None) for i in range(10)]
        lines, mapping = canonicalize(quads)
        assert len(lines) == 10 and len(mapping) == 10
