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
