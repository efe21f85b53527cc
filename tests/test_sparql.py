"""SPARQL text front-end (operators/sparql.py): parser shapes and
errors, DataFrame execution semantics on a hand-built graph, and
cross-engine equivalence of the DuckDB SQL twin for every construct."""

from __future__ import annotations

import duckdb
import pytest

from rdf_go_spark.operators.sparql import (
    SparqlError, parse_sparql, sparql_select, sparql_sql,
)

_EDGES = [
    ("<http://x/a>", "<http://x/knows>", "<http://x/b>"),
    ("<http://x/b>", "<http://x/knows>", "<http://x/c>"),
    ("<http://x/a>", "<http://x/likes>", "<http://x/d>"),
    ("<http://x/b>", "<http://x/likes>", "<http://x/d>"),
    ("<http://x/a>", "<http://x/age>",
     '"3"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    ("<http://x/b>", "<http://x/age>",
     '"7"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    ("<http://x/c>", "<http://x/age>",
     '"7"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    ("<http://x/a>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
     "<http://x/Person>"),
    ("<http://x/d>", "<http://x/label>", '"dee"@en'),
]


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(_EDGES, ["subj", "pred", "obj"])


def _tiny_cte() -> str:
    rows = ", ".join(
        "(" + ", ".join("'" + t.replace("'", "''") + "'" for t in e) + ")"
        for e in _EDGES)
    return f"SELECT * FROM (VALUES {rows}) t(subj, pred, obj)"


def _both(tiny, query):
    sp = sorted(
        tuple(r) for r in sparql_select(tiny, query).collect())
    du = sorted(
        tuple(r) for r in
        duckdb.sql(sparql_sql(query, _tiny_cte())).fetchall())
    return sp, du


class TestParser:
    def test_prefix_expansion_and_lists(self):
        q = parse_sparql("""
            PREFIX x: <http://x/>
            SELECT ?s ?o WHERE { ?s x:knows ?o ; x:likes ?d . }
        """)
        blk = q.blocks[0]
        assert blk.patterns == [
            ("?s", "<http://x/knows>", "?o"),
            ("?s", "<http://x/likes>", "?d")]

    def test_object_list_and_a(self):
        q = parse_sparql(
            "PREFIX x: <http://x/> "
            "SELECT * WHERE { ?s a x:Person . ?s x:likes x:d, x:e }")
        blk = q.blocks[0]
        assert blk.patterns[0][1] == \
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
        assert [p[2] for p in blk.patterns[1:]] == [
            "<http://x/d>", "<http://x/e>"]

    def test_integer_literal_canonicalizes(self):
        q = parse_sparql(
            "PREFIX x: <http://x/> SELECT ?s WHERE { ?s x:age 7 }")
        assert q.blocks[0].patterns[0][2] == \
            '"7"^^<http://www.w3.org/2001/XMLSchema#integer>'

    def test_path_predicate(self):
        q = parse_sparql(
            "PREFIX x: <http://x/> "
            "SELECT ?s ?o WHERE { ?s x:knows+/x:likes ?o }")
        assert q.blocks[0].patterns[0][1] == \
            "<http://x/knows>+/<http://x/likes>"

    def test_modifiers(self):
        q = parse_sparql("""
            PREFIX x: <http://x/>
            SELECT ?age (COUNT(*) AS ?n) WHERE { ?s x:age ?age }
            GROUP BY ?age ORDER BY DESC(?n) ?age LIMIT 5
        """)
        assert q.group_by == ["age"] and q.limit == 5
        assert q.order_by == [("n", False), ("age", True)]

    @pytest.mark.parametrize("bad, msg", [
        ("ASK WHERE { ?s ?p ?o } OFFSET 2", "solution modifiers"),
        ("ASK WHERE { ?s ?p ?o } LIMIT 1", "solution modifiers"),
        ("DESCRIBE WHERE { ?s ?p ?o }", "needs .vars or IRIs"),
        ("PREFIX x: <http://x/> DESCRIBE ?s", "missing WHERE"),
        ("SELECT ?s WHERE { ?s y:p ?o }", "undeclared prefix"),
        ("SELECT WHERE { ?s ?p ?o }", "empty SELECT"),
        ("SELECT (SUM(*) AS ?n) WHERE { ?s ?p ?o }", "not valid"),
        ("SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o }",
         "neither aggregated nor"),
        ("SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY",
         "at least one"),
        ("SELECT ?s WHERE { ?s ?p ?o } LIMIT 1.5", "non-negative integer"),
        ("SELECT ?s WHERE { ?s ?p ?o . FILTER(?s ~ 3) }", "unexpected"),
        ("SELECT ?s WHERE { ?s ?p ?o . FILTER(?s < ?o) }",
         "variable-to-variable"),
        ("CONSTRUCT { } WHERE { ?s ?p ?o }", "empty CONSTRUCT"),
    ])
    def test_rejects(self, bad, msg):
        with pytest.raises(SparqlError, match=msg):
            parse_sparql(bad)


class TestExecution:
    def test_basic_select_and_twin(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?o WHERE { ?s x:knows ?o }
        """)
        assert sp == du and len(sp) == 2

    def test_star_distinct(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT DISTINCT * WHERE { ?s x:likes ?d }
        """)
        assert sp == du and len(sp) == 2

    def test_filter_optional_minus_union(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?age ?lab WHERE {
              { ?s x:age ?age .
                OPTIONAL { ?s x:likes ?d . ?d x:label ?lab }
                FILTER(?age >= 7)
                MINUS { ?s x:knows <http://x/c> } }
              UNION
              { ?s a x:Person . ?s x:age ?age } }
        """)
        assert sp == du
        # block1: b,c pass the filter; MINUS removes b (knows c) -> c
        # with lab NULL (c likes nothing); block2: a (Person, age 3)
        assert len(sp) == 2

    def test_path_in_sparql(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?d WHERE { ?s x:knows+/x:likes ?d }
        """)
        assert sp == du
        # a knows+ {b,c}; b likes d -> (a,d); b knows+ {c}; c likes
        # nothing -> only (a,d)
        assert sp == [("<http://x/a>", "<http://x/d>")]

    def test_order_by_aggregate_alias(self, tiny):
        # raw (unsorted) collect: the engine-side ordering itself is
        # under test, not just the multiset
        q = """
            PREFIX x: <http://x/>
            SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o }
            GROUP BY ?s ORDER BY DESC(?n) ?s LIMIT 3
        """
        sp = [tuple(r) for r in sparql_select(tiny, q).collect()]
        du = [tuple(r) for r in
              duckdb.sql(sparql_sql(q, _tiny_cte())).fetchall()]
        assert sp == du and len(sp) == 3
        assert [r[1] for r in sp] == sorted(
            [r[1] for r in sp], reverse=True)

    def test_order_by_expression_alias(self, tiny):
        q = """
            PREFIX x: <http://x/>
            SELECT ?s (STR(?s) AS ?raw) WHERE { ?s x:age ?n }
            ORDER BY DESC(?raw)
        """
        sp = [tuple(r) for r in sparql_select(tiny, q).collect()]
        du = [tuple(r) for r in
              duckdb.sql(sparql_sql(q, _tiny_cte())).fetchall()]
        assert sp == du
        assert [r[1] for r in sp] == sorted(
            [r[1] for r in sp], reverse=True)

    def test_zero_length_star_in_sparql(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?o WHERE { ?s x:age ?n . ?s x:knows* ?o }
        """)
        assert sp == du
        # identity (s,s) for every aged node plus the knows chains
        assert ("<http://x/a>", "<http://x/a>") in {(r[0], r[1])
                                                    for r in sp}

    def test_zero_or_one_const_subject_in_sparql(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?o WHERE { <http://x/a> x:knows? ?o }
        """)
        assert sp == du
        assert ("<http://x/a>",) in sp  # the zero-length self-binding

    def test_bounded_repetition_in_sparql(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?o WHERE { ?s x:knows{1,2} ?o }
        """)
        assert sp == du
        # knows: a->b->c (no cycle): 1-hop pairs + the single 2-hop
        assert set(sp) == {("<http://x/a>", "<http://x/b>"),
                           ("<http://x/b>", "<http://x/c>"),
                           ("<http://x/a>", "<http://x/c>")}

    def test_negated_property_set_in_sparql(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?o WHERE { ?s !(x:knows|x:age|a) ?o }
        """)
        assert sp == du
        # likes and label edges survive the negation
        assert len(sp) == 3

    def test_aggregates_group_order(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?age (COUNT(*) AS ?n) (MIN(?age2) AS ?m)
            WHERE { ?s x:age ?age . ?s x:age ?age2 }
            GROUP BY ?age ORDER BY ?age
        """)
        assert sp == du
        assert [(r[1], r[2]) for r in sp] == [(1, 3), (2, 7)]

    def test_global_aggregate(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT (COUNT(DISTINCT ?s) AS ?n) (SUM(?a) AS ?total)
                   (AVG(?a) AS ?mean)
            WHERE { ?s x:age ?a }
        """)
        assert sp == du == [(3, 17, pytest.approx(17 / 3, abs=1e-6))]

    def test_order_limit(self, tiny):
        sp = [tuple(r) for r in sparql_select(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?a WHERE { ?s x:age ?a } ORDER BY DESC(?a) ?s LIMIT 2
        """).collect()]
        du = duckdb.sql(sparql_sql("""
            PREFIX x: <http://x/>
            SELECT ?s ?a WHERE { ?s x:age ?a } ORDER BY DESC(?a) ?s LIMIT 2
        """, _tiny_cte())).fetchall()
        assert sp == [tuple(r) for r in du]
        assert [r[0] for r in sp] == ["<http://x/b>", "<http://x/c>"]

    def test_construct(self, tiny):
        qtext = """
            PREFIX x: <http://x/>
            CONSTRUCT { ?o x:knownBy ?s . ?s a x:Knower }
            WHERE { ?s x:knows ?o }
        """
        sp = sorted(tuple(r) for r in sparql_select(tiny, qtext).collect())
        du = sorted(tuple(r) for r in
                    duckdb.sql(sparql_sql(qtext, _tiny_cte())).fetchall())
        assert sp == du and len(sp) == 4
        assert ("<http://x/b>", "<http://x/knownBy>", "<http://x/a>") in sp

    def test_construct_skips_unbound(self, tiny):
        # ?lab unbound for most likers -> those instantiations drop
        qtext = """
            PREFIX x: <http://x/>
            CONSTRUCT { ?s x:likesLabeled ?lab }
            WHERE { ?s x:likes ?d . OPTIONAL { ?d x:missing ?lab } }
        """
        sp = sparql_select(tiny, qtext).collect()
        du = duckdb.sql(sparql_sql(qtext, _tiny_cte())).fetchall()
        assert len(sp) == len(du) == 0

    def test_ask(self, tiny):
        for qtext, expect in [
            ("PREFIX x: <http://x/> ASK { ?s x:knows <http://x/c> }", True),
            ("PREFIX x: <http://x/> ASK WHERE { ?s x:knows <http://x/z> }",
             False),
        ]:
            sp = sparql_select(tiny, qtext).collect()
            du = duckdb.sql(sparql_sql(qtext, _tiny_cte())).fetchall()
            assert [bool(r[0]) for r in sp] == [bool(r[0]) for r in du] \
                == [expect]

    def test_describe_var(self, tiny):
        qtext = """
            PREFIX x: <http://x/>
            DESCRIBE ?s WHERE { ?s x:age 7 }
        """
        sp = sorted(tuple(r) for r in sparql_select(tiny, qtext).collect())
        du = sorted(tuple(r) for r in
                    duckdb.sql(sparql_sql(qtext, _tiny_cte())).fetchall())
        assert sp == du
        # b and c are described: b has knows+likes+age, c has age
        assert {r[0] for r in sp} == {"<http://x/b>", "<http://x/c>"}
        assert len(sp) == 4

    def test_describe_const_no_where(self, tiny):
        qtext = "PREFIX x: <http://x/> DESCRIBE x:a <http://x/d>"
        sp = sorted(tuple(r) for r in sparql_select(tiny, qtext).collect())
        du = sorted(tuple(r) for r in
                    duckdb.sql(sparql_sql(qtext, _tiny_cte())).fetchall())
        assert sp == du and len(sp) == 5   # a: 4 triples, d: 1 label

    def test_graph_clause(self, spark):
        quads = spark.createDataFrame(
            [("<g1>", "<a>", "<p>", "<b>"),
             ("<g1>", "<b>", "<p>", "<c>"),
             ("<g2>", "<a>", "<p>", "<b>"),
             (None, "<x>", "<p>", "<y>")],     # default graph: invisible
            ["graph", "subj", "pred", "obj"])
        rows = ", ".join(
            "(" + ", ".join(
                "NULL" if t is None else "'" + t + "'" for t in e) + ")"
            for e in [("<g1>", "<a>", "<p>", "<b>"),
                      ("<g1>", "<b>", "<p>", "<c>"),
                      ("<g2>", "<a>", "<p>", "<b>"),
                      (None, "<x>", "<p>", "<y>")])
        cte = (f"SELECT * FROM (VALUES {rows}) "
               f"t(graph, subj, pred, obj)")
        qtext = """
            SELECT ?g (COUNT(*) AS ?n)
            WHERE { GRAPH ?g { ?s <p> ?o } } GROUP BY ?g
        """
        sp = sorted(tuple(r) for r in
                    sparql_select(quads, qtext).collect())
        du = sorted(tuple(r) for r in
                    duckdb.sql(sparql_sql(qtext, cte)).fetchall())
        assert sp == du == [("<g1>", 2), ("<g2>", 1)]
        # constant graph restricts; same-graph join via shared ?g
        qtext2 = "SELECT ?s ?o WHERE { GRAPH <g2> { ?s <p> ?o } }"
        sp2 = [tuple(r) for r in sparql_select(quads, qtext2).collect()]
        du2 = [tuple(r) for r in
               duckdb.sql(sparql_sql(qtext2, cte)).fetchall()]
        assert sp2 == du2 == [("<a>", "<b>")]
        # two patterns inside GRAPH ?g must match in the SAME graph:
        # a->b->c chains only within g1
        qtext3 = ("SELECT ?g ?x ?z WHERE "
                  "{ GRAPH ?g { ?x <p> ?y . ?y <p> ?z } }")
        sp3 = [tuple(r) for r in sparql_select(quads, qtext3).collect()]
        du3 = [tuple(r) for r in
               duckdb.sql(sparql_sql(qtext3, cte)).fetchall()]
        assert sp3 == du3 == [("<g1>", "<a>", "<c>")]

    def test_graph_rejects(self, tiny):
        with pytest.raises(SparqlError, match="mixing"):
            parse_sparql("SELECT ?s WHERE { ?s <q> ?d . "
                         "GRAPH ?g { ?s <p> ?o } }")
        with pytest.raises(SparqlError, match="one GRAPH"):
            parse_sparql("SELECT ?s WHERE { GRAPH ?g { ?s <p> ?o } "
                         "GRAPH ?h { ?s <q> ?d } }")
        # triples-only table lacks the graph column
        with pytest.raises(ValueError, match="quads table"):
            sparql_select(
                tiny, "SELECT ?s WHERE { GRAPH ?g { ?s <p> ?o } }")

    def test_lang_literal_roundtrip(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?d WHERE { ?d x:label "dee"@en }
        """)
        assert sp == du == [("<http://x/d>",)]

    def test_filter_lang(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?d ?lab WHERE { ?d x:label ?lab .
                                   FILTER(LANG(?lab) = "en") }
        """)
        assert sp == du == [("<http://x/d>", '"dee"@en')]
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?d WHERE { ?d x:label ?lab .
                              FILTER(LANG(?lab) != "en") }
        """)
        assert sp2 == du2 == []

    def test_filter_datatype(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
            SELECT ?s ?v WHERE { ?s ?p ?v .
                                 FILTER(DATATYPE(?v) = xsd:integer) }
        """)
        assert sp == du and len(sp) == 3      # the three age literals

    def test_filter_str_functions(self, tiny):
        # STR of an IRI is its inner text
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?o WHERE { ?s x:knows ?o .
                                 FILTER(STRSTARTS(?o, "http://x/c")) }
        """)
        assert sp == du == [("<http://x/b>", "<http://x/c>")]
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?d WHERE { ?d x:label ?lab .
                              FILTER(CONTAINS(?lab, "de")) }
        """)
        assert sp2 == du2 == [("<http://x/d>",)]
        sp3, du3 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s WHERE { ?s x:age ?a .
                              FILTER(!STRENDS(?s, "/a")) }
        """)
        assert sp3 == du3 and {r[0] for r in sp3} == {
            "<http://x/b>", "<http://x/c>"}

    def test_values(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?a WHERE { ?s x:age ?a .
                                 VALUES ?s { x:a x:c <http://x/nope> } }
        """)
        assert sp == du and {r[0] for r in sp} == {
            "<http://x/a>", "<http://x/c>"}

    @pytest.mark.parametrize("bad, msg", [
        ("SELECT ?s WHERE { VALUES (?s ?o) { } ?s ?p ?o }",
         "empty VALUES"),
        ("SELECT ?s WHERE { VALUES (?s ?o) { (<a>) } ?s ?p ?o }",
         "1 terms for 2 variables"),
        ("SELECT ?s WHERE { ?s ?p ?o . VALUES ?s { } }", "empty VALUES"),
        ("SELECT ?s WHERE { ?s ?p ?o . FILTER(LANG(?o) = 3) }",
         "plain string"),
        ("SELECT ?s WHERE { ?s ?p ?o . FILTER(!LANG(?o) = \"en\") }",
         "instead of"),
        ("SELECT ?s WHERE { ?s ?p ?o . FILTER(DATATYPE(?o) = \"x\") }",
         "needs an IRI"),
        ("SELECT ?s WHERE { ?s ?p ?o . FILTER(LANG(?o) < \"en\") }",
         "only = and"),
    ])
    def test_builtin_rejects(self, bad, msg):
        with pytest.raises(SparqlError, match=msg):
            parse_sparql(bad)

    def test_subquery_join(self, tiny):
        # classic nested aggregation: people who know someone, joined
        # with their age-group restriction computed in a subquery
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?o WHERE {
              ?s x:knows ?o .
              { SELECT ?s WHERE { ?s x:age ?a } GROUP BY ?s
                HAVING(COUNT(?a) >= 1) }
            }
        """)
        assert sp == du and len(sp) == 2
        # subquery-only WHERE (restriction pushed entirely down)
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s WHERE {
              { SELECT DISTINCT ?s WHERE { ?s x:likes ?d } }
            }
        """)
        assert sp2 == du2 and {r[0] for r in sp2} == {
            "<http://x/a>", "<http://x/b>"}

    def test_subquery_aggregate_inner(self, tiny):
        # inner aggregate feeding the outer pattern: entity ages joined
        # with per-subject knows-count from a subquery
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?a ?nk WHERE {
              ?s x:age ?a .
              { SELECT ?s (COUNT(?o) AS ?nk) WHERE { ?s x:knows ?o }
                GROUP BY ?s }
            }
        """)
        assert sp == du and len(sp) == 2
        assert {(r[0], r[2]) for r in sp} == {
            ("<http://x/a>", 1), ("<http://x/b>", 1)}

    def test_subquery_rejects(self, tiny):
        with pytest.raises(SparqlError, match="only . SELECT"):
            parse_sparql("SELECT ?s WHERE { ?s ?p ?o . { ?x ?y ?z } }")
        with pytest.raises(SparqlError, match="shares no variable"):
            sparql_select(tiny, """
                PREFIX x: <http://x/>
                SELECT ?s WHERE {
                  ?s x:age ?a .
                  { SELECT ?zz WHERE { ?zz x:label ?l } } }
            """)

    def test_group_by_without_select_aggregate(self, tiny):
        # the DISTINCT-keys + HAVING shape
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?a WHERE { ?s x:age ?a } GROUP BY ?a
            HAVING(COUNT(*) > 1)
        """)
        assert sp == du and len(sp) == 1

    def test_bind(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?lg WHERE {
              ?s x:label ?lab .
              BIND(LANG(?lab) AS ?lg)
              FILTER(?lg = "en") }
        """)
        assert sp == du == [("<http://x/d>", "en")]
        # constant BIND tagging UNION branches
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?src WHERE {
              { ?s x:knows ?o . BIND("knower" AS ?src) }
              UNION
              { ?s x:likes ?o . BIND("liker" AS ?src) } }
        """)
        assert sp2 == du2 and len(sp2) == 4
        assert {r[1] for r in sp2} == {'"knower"', '"liker"'}

    def test_bind_rejects(self, tiny):
        with pytest.raises(SparqlError, match="not a bare variable"):
            parse_sparql("SELECT ?s WHERE { ?s ?p ?o . BIND(?o AS ?x) }")
        with pytest.raises(ValueError, match="already bound"):
            sparql_select(tiny, """
                PREFIX x: <http://x/>
                SELECT ?s WHERE { ?s x:age ?a . BIND(STR(?s) AS ?a) }
            """).collect()

    def test_filter_boolean_combinations(self, tiny):
        # && chain
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s WHERE { ?s x:age ?a .
                              FILTER(?a > 2 && ?a < 7) }
        """)
        assert sp == du == [("<http://x/a>",)]
        # || of && chains (DNF), mixing numeric and builtin atoms
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s ?a WHERE {
              ?s x:age ?a .
              FILTER(?a < 4 || ?a > 6 && CONTAINS(?s, "/b")) }
        """)
        # a=3 passes left; b=7 passes right; c=7 fails CONTAINS
        assert sp2 == du2 and {r[0] for r in sp2} == {
            "<http://x/a>", "<http://x/b>"}

    def test_single_ampersand_rejected(self):
        with pytest.raises(SparqlError, match="single '&'"):
            parse_sparql("SELECT ?s WHERE { ?s ?p ?o . FILTER(?s = 1 & 2) }")

    def test_select_expressions(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT (STR(?d) AS ?iri) (LANG(?lab) AS ?lg)
                   (DATATYPE(?lab) AS ?dt)
            WHERE { ?d x:label ?lab }
        """)
        # DATATYPE of a lang-tagged literal = rdf:langString (RDF 1.1)
        assert sp == du == [(
            "http://x/d", "en",
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>")]
        # expression over a GROUP BY var, mixed with an aggregate
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT (STR(?s) AS ?name) (COUNT(*) AS ?n)
            WHERE { ?s x:age ?a } GROUP BY ?s
        """)
        assert sp2 == du2 and len(sp2) == 3
        assert all(not r[0].startswith("<") for r in sp2)

    def test_select_expression_rejects(self, tiny):
        with pytest.raises(SparqlError, match="neither aggregated"):
            parse_sparql("SELECT (STR(?s) AS ?n) (COUNT(*) AS ?c) "
                         "WHERE { ?s ?p ?o }")
        with pytest.raises(SparqlError, match="cannot mix"):
            parse_sparql("SELECT * (STR(?s) AS ?n) WHERE { ?s ?p ?o }")

    def test_group_concat_and_sample(self, tiny):
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s (GROUP_CONCAT(?o; SEPARATOR=", ") AS ?all)
                   (SAMPLE(?o) AS ?one)
            WHERE { ?s x:knows ?o } GROUP BY ?s
        """)
        assert sp == du
        assert dict((r[0], r[1]) for r in sp) == {
            "<http://x/a>": "<http://x/b>", "<http://x/b>": "<http://x/c>"}
        # distinct + sorted order is the cross-engine determinism rule
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT (GROUP_CONCAT(DISTINCT ?d) AS ?ds)
            WHERE { ?s x:likes ?d }
        """)
        assert sp2 == du2 == [("<http://x/d>",)]

    def test_filter_exists(self, tiny):
        # correlated: people with an age who also know someone
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s WHERE { ?s x:age ?a .
                              FILTER(EXISTS { ?s x:knows ?o }) }
        """)
        assert sp == du and {r[0] for r in sp} == {
            "<http://x/a>", "<http://x/b>"}
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s WHERE { ?s x:age ?a .
                              FILTER(NOT EXISTS { ?s x:knows ?o }) }
        """)
        assert sp2 == du2 and {r[0] for r in sp2} == {"<http://x/c>"}

    def test_filter_exists_uncorrelated(self, tiny):
        # no shared variable: the block's matchability gates everything
        # (unlike MINUS, which would remove nothing)
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s WHERE { ?s x:age ?a .
                              FILTER(NOT EXISTS { ?z x:label ?lab }) }
        """)
        assert sp == du == []     # a label exists -> all solutions drop
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?s WHERE { ?s x:age ?a .
                              FILTER(EXISTS { ?z x:nosuch ?w }) }
        """)
        assert sp2 == du2 == []   # nothing matches -> EXISTS gates all

    def test_offset_and_unprojected_order(self, tiny):
        # ORDER BY a variable that is NOT projected (pre-projection sort,
        # SPARQL algebra), plus OFFSET pagination
        q1 = """
            PREFIX x: <http://x/>
            SELECT ?s WHERE { ?s x:age ?a } ORDER BY DESC(?a) ?s
            LIMIT 2 OFFSET 1
        """
        sp = [r.s for r in sparql_select(tiny, q1).collect()]
        du = [r[0] for r in duckdb.sql(sparql_sql(q1, _tiny_cte()))
              .fetchall()]
        # ages: b=7, c=7, a=3 -> sorted b,c,a; offset 1 limit 2 -> c,a
        assert sp == du == ["<http://x/c>", "<http://x/a>"]

    def test_distinct_unprojected_order_rejected(self, tiny):
        with pytest.raises(SparqlError, match="only projected"):
            sparql_select(tiny, """
                PREFIX x: <http://x/>
                SELECT DISTINCT ?s WHERE { ?s x:age ?a } ORDER BY ?a
            """).collect()

    def test_having(self, tiny):
        # ages 3, 7, 7 -> HAVING count > 1 keeps only age 7
        sp, du = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?a (COUNT(*) AS ?n) WHERE { ?s x:age ?a }
            GROUP BY ?a HAVING(COUNT(*) > 1)
        """)
        assert sp == du and len(sp) == 1 and sp[0][1] == 2
        # alias form, plus a HAVING aggregate absent from SELECT
        sp2, du2 = _both(tiny, """
            PREFIX x: <http://x/>
            SELECT ?a (COUNT(*) AS ?n) WHERE { ?s x:age ?a }
            GROUP BY ?a HAVING(?n <= 1) HAVING(COUNT(DISTINCT ?s) >= 1)
        """)
        assert sp2 == du2 and len(sp2) == 1 and sp2[0][1] == 1

    @pytest.mark.parametrize("bad, msg", [
        ("SELECT ?s WHERE { ?s ?p ?o } HAVING(COUNT(*) > 1)",
         "requires aggregation"),
        ("SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } HAVING(?m > 1)",
         "unknown alias"),
        ("SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } HAVING(?n > \"x\")",
         "compares to an integer"),
    ])
    def test_having_rejects(self, bad, msg):
        with pytest.raises(SparqlError, match=msg):
            parse_sparql(bad)

    def test_package_level_sparql(self, tiny):
        import rdf_go_spark
        out = rdf_go_spark.sparql(
            tiny, "SELECT ?s WHERE { ?s <http://x/age> 3 }").collect()
        assert [r.s for r in out] == ["<http://x/a>"]


class TestQuadIntegration:
    def test_parsed_trig_quads_through_graph_query(self, spark):
        """Full loop: TriG text → kernel parser → quads DataFrame →
        SPARQL GRAPH query (named graphs from the document itself)."""
        import rdf_go_spark as r
        from rdf_go_spark.terms import render_term
        text = """
            @prefix x: <http://x/> .
            x:g1 { x:a x:p x:b . x:b x:p x:c . }
            x:g2 { x:a x:p x:b . }
            x:a x:q x:d .
        """
        stmts, errs, fmt = r.parse(text)
        assert fmt == "trig" and not errs
        rows = [(render_term(s.g) if s.g is not None else None,
                 render_term(s.s), render_term(s.p), render_term(s.o))
                for s in stmts]
        quads = spark.createDataFrame(
            rows, "graph string, subj string, pred string, obj string")
        out = r.sparql(quads, """
            PREFIX x: <http://x/>
            SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s x:p ?o } }
            GROUP BY ?g ORDER BY ?g
        """).collect()
        assert [(r_.g, r_.n) for r_ in out] == [
            ("<http://x/g1>", 2), ("<http://x/g2>", 1)]

    def test_construct_materialize_roundtrip(self, spark, tmp_path):
        """Graph-to-graph pipeline: CONSTRUCT output is a canonical
        triple set that materializes through the lineage store and
        queries back identically."""
        from rdf_go_spark.operators import graph
        from pyspark.sql import functions as F
        tiny = spark.createDataFrame(_EDGES, ["subj", "pred", "obj"])
        derived = sparql_select(tiny, """
            PREFIX x: <http://x/>
            CONSTRUCT { ?o x:knownBy ?s } WHERE { ?s x:knows ?o }
        """).withColumn("conv_id", F.lit("c0")) \
            .withColumn("turn_idx", F.lit(0))
        root = str(tmp_path / "g")
        summary = graph.materialize(derived, root, n_partitions=4)
        assert sum(1 for _ in summary["written"]) >= 1
        back = graph.read_graph(spark, root).select("subj", "pred", "obj")
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, derived.select("subj", "pred", "obj").collect()))


class TestSparqlUpdate:
    """SPARQL 1.1 Update subset: every form cross-checked against the
    chained-CTE DuckDB twin (update_sql), plus op-order semantics and
    ground-data validation."""

    CASES = [
        'INSERT DATA { <e> <http://x/p> <f> . <http://x/a> <http://x/p>'
        ' <http://x/b> }',
        'DELETE DATA { <http://x/a> <http://x/age>'
        ' "3"^^<http://www.w3.org/2001/XMLSchema#integer> }',
        'DELETE WHERE { ?s <http://x/knows> ?o }',
        'PREFIX x: <http://x/> DELETE { ?s x:knows ?o } '
        'INSERT { ?s x:knew ?o } WHERE { ?s x:knows ?o }',
        'PREFIX x: <http://x/> INSERT { ?o x:knownBy ?s } '
        'WHERE { ?s x:knows ?o }',
        'INSERT DATA { <e> <http://x/p> <f> } ; '
        'DELETE DATA { <e> <http://x/p> <f> }',
        'PREFIX x: <http://x/> DELETE { ?s x:knows ?o } '
        'INSERT { ?s x:knows ?o } WHERE { ?s x:knows ?o }',
        'PREFIX x: <http://x/> DELETE { ?s ?p ?o } '
        'WHERE { ?s ?p ?o . FILTER(STRSTARTS(?s, "http://x/a")) }',
    ]

    @pytest.mark.parametrize("u", CASES)
    def test_update_matches_sql_twin(self, tiny, u):
        from rdf_go_spark.operators.sparql import sparql_update, update_sql
        out = sparql_update(tiny, u)
        sp = sorted((r.subj, r.pred, r.obj) for r in out.collect())
        du = sorted(tuple(r) for r in
                    duckdb.sql(update_sql(u, _tiny_cte())).fetchall())
        assert sp == du

    def test_delete_then_insert_same_triple_survives(self, tiny):
        # SPARQL op order: deletes first, then inserts — identity update
        from rdf_go_spark.operators.sparql import sparql_update
        u = ('PREFIX x: <http://x/> DELETE { ?s x:knows ?o } '
             'INSERT { ?s x:knows ?o } WHERE { ?s x:knows ?o }')
        before = sorted(map(tuple, tiny.select("subj", "pred", "obj")
                            .collect()))
        after = sorted(map(tuple, sparql_update(tiny, u)
                           .select("subj", "pred", "obj").collect()))
        assert before == after

    def test_insert_is_set_semantics(self, tiny):
        from rdf_go_spark.operators.sparql import sparql_update
        u = ('INSERT DATA { <http://x/a> <http://x/knows> <http://x/b> }')
        assert sparql_update(tiny, u).count() == tiny.count()

    def test_extra_columns_preserved_and_derived(self, spark):
        from rdf_go_spark.operators.sparql import sparql_update
        df = spark.createDataFrame(
            [("<s>", "<p>", "<o>", False, "c1", 3)],
            "subj string, pred string, obj string, obj_is_literal boolean,"
            "conv_id string, turn_idx int")
        out = sparql_update(df, 'INSERT DATA { <s2> <p> "lit" }')
        rows = {r.subj: r for r in out.collect()}
        assert rows["<s>"].obj_is_literal is False
        assert rows["<s2>"].obj_is_literal is True   # derived from term
        assert rows["<s>"].conv_id == "c1" and rows["<s>"].turn_idx == 3
        assert rows["<s2>"].conv_id is None

    def test_rejects(self, tiny):
        from rdf_go_spark.operators.sparql import parse_update
        with pytest.raises(SparqlError, match="ground"):
            parse_update('INSERT DATA { ?s <p> <o> }')
        with pytest.raises(SparqlError, match="empty update"):
            parse_update('INSERT DATA { }')
        with pytest.raises(SparqlError, match="INSERT or DELETE"):
            parse_update('SELECT ?s WHERE { ?s ?p ?o }')
        with pytest.raises(SparqlError, match="WHERE|end of query"):
            parse_update('DELETE { <a> <p> <o> }')

    def test_store_roundtrip_noop_rewrites_nothing(self, spark, tmp_path):
        """Graph-store integration: apply a no-op update through
        incremental_update — the checksum diff must rewrite ZERO
        partitions (the 100 TB maintenance property)."""
        from rdf_go_spark.operators import graph
        from rdf_go_spark.operators.sparql import sparql_update
        from rdf_go_spark.plans.pipeline import kg_triples
        root = str(tmp_path / "upd_store")
        t = kg_triples(spark, "/root/testdata/sf0.001")
        graph.materialize(t, root, n_partitions=4)
        g = graph.read_graph(spark, root).drop("part_id")
        updated = sparql_update(
            g, 'DELETE WHERE { ?s <http://example.org/v/nope> ?o }')
        summary = graph.incremental_update(updated, root, n_partitions=4)
        assert summary["written"] == []
        assert len(summary["unchanged"]) == 4
