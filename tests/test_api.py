"""Package-level user API: the reference's two-call surface
(rdf/api.go Parse/NewWriter) as rdf_go_spark.parse/encode, plus the
sparql() entry point (covered across engines in test_sparql.py)."""

from __future__ import annotations

import pytest

import rdf_go_spark as r


def test_parse_autodetects_and_quarantines():
    stmts, errs, fmt = r.parse('@prefix x: <http://x/> . x:a x:p 3 .')
    assert fmt == "turtle" and len(stmts) == 1 and not errs
    stmts2, errs2, fmt2 = r.parse("<a <b garbage", format="ntriples")
    assert stmts2 == [] and errs2 and fmt2 == "ntriples"


@pytest.mark.parametrize("fmt", ["ntriples", "nquads", "turtle", "trig",
                                 "jsonld", "rdfxml"])
def test_encode_parse_roundtrip_every_format(fmt):
    stmts, errs, _ = r.parse(
        '<http://x/a> <http://x/p> "v" . \n'
        '<http://x/a> <http://x/q> '
        '"3"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        format="ntriples")
    assert not errs
    out = r.encode(stmts, fmt)
    back, errs2, _ = r.parse(out, format=fmt)
    assert not errs2
    assert {(str(s.s), str(s.p)) for s in back} == \
        {(str(s.s), str(s.p)) for s in stmts}
    assert len(back) == len(stmts)


def test_encode_rejects_unknown_format():
    with pytest.raises(ValueError, match="unknown format"):
        r.encode([], "bogus")
