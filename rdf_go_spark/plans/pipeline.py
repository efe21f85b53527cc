"""End-to-end KG-construction pipeline assembly + DuckDB oracle SQL.

The flagship job (north rule): transcripts → triple extraction → entity
linking → canonicalization → graph table. The oracle SQL reproduces the
expected triple set with pure arithmetic over the same deterministic
generator — a fully independent check of the Spark path (window ordering,
broadcast join, skolemization, payload parsing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extraction import CONV_NS, extract_triples
from ..sources.transcripts import (
    entities_sql, n_conv_for_sf_dir, synth_entities, synth_transcripts,
    transcripts_sql,
)


def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: the full extraction triple set for the sf-scale
    transcript corpus."""
    n_conv = n_conv_for_sf_dir(sf_dir)
    transcripts = synth_transcripts(spark, n_conv)
    entities = synth_entities(spark)
    return extract_triples(transcripts, entities)


def kg_export_ntriples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical N-Triples export of the RE-canonicalized graph
    (rdf/ntriples.go:613-626 line shape). Routing the export through a
    second canonicalization pass makes one hash check pin BOTH the
    encoder line shape AND canonicalization idempotence: the oracle is
    the plain single-pass export, so any term the second pass rewrites
    mismatches."""
    from pyspark.sql import functions as F

    from ..operators.canonicalize import canonical_only, canonicalize_triples
    t = canonical_only(canonicalize_triples(kg_triples(spark, sf_dir)))
    return t.select(
        F.concat_ws(" ", "subj", "pred", "obj", F.lit(".")).alias("line"),
        "conv_id", "turn_idx")


def kg_export_ntriples_oracle_sql(n_conv: int) -> str:
    return f"""
WITH base AS ({kg_triples_oracle_sql(n_conv)})
SELECT subj || ' ' || pred || ' ' || obj || ' .' AS line, conv_id, turn_idx
FROM base
""".strip()


def rdf_parse_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed parse with format auto-detection: one synthetic RDF
    document per conversation, cycling Turtle / N-Triples / JSON-LD —
    exercises detect.py + three parser kernels inside mapInPandas.

    The JSON-LD branch asserts the reference's native-number →
    xsd:decimal quirk end-to-end (rdf/jsonld_helpers.go:10-21).
    """
    from pyspark.sql import functions as F

    from ..operators.parse_spark import parse_rdf_documents, triples_of
    from ..sources.transcripts import n_conv_for_sf_dir

    n = n_conv_for_sf_dir(sf_dir)
    base = spark.range(0, n).select(
        F.format_string("conv-%06d", F.col("id")).alias("doc_key"),
        (F.col("id") % 3).cast("int").alias("variant"),
        (F.col("id") % 8 + 1).cast("int").alias("n_turns"))
    conv_iri = F.format_string("http://example.org/conv/%s", F.col("doc_key"))
    turtle = F.format_string(
        "@prefix c: <http://example.org/conv/> .\n"
        "@prefix v: <http://example.org/v/> .\n"
        "c:%s v:turns %d ; v:kind \"turtle\" .\n",
        F.col("doc_key"), F.col("n_turns"))
    ntriples = F.format_string(
        "<%s> <http://example.org/v/turns> "
        "\"%d\"^^<http://www.w3.org/2001/XMLSchema#integer> .\n"
        "<%s> <http://example.org/v/kind> \"ntriples\" .\n",
        conv_iri, F.col("n_turns"), conv_iri)
    jsonld = F.format_string(
        '{"@context":{"v":"http://example.org/v/"},"@id":"%s",'
        '"v:turns":%d,"v:kind":"jsonld"}',
        conv_iri, F.col("n_turns"))
    docs = base.withColumn(
        "text",
        F.when(F.col("variant") == 0, turtle)
        .when(F.col("variant") == 1, ntriples)
        .otherwise(jsonld))
    parsed = parse_rdf_documents(docs, fmt=None)  # auto-detect
    return triples_of(parsed).select(
        "doc_key", "fmt", "subj", "pred", "obj", "obj_is_literal")


def rdf_parse_multiformat_oracle_sql(n_conv: int) -> str:
    return f"""
WITH base AS (
  SELECT printf('conv-%06d', i) AS doc_key,
         (i % 3)::INT AS variant,
         (i % 8 + 1)::INT AS n_turns,
         '<http://example.org/conv/' || printf('conv-%06d', i) || '>' AS conv_iri
  FROM range(0, {n_conv}) r(i)
),
fmts AS (
  SELECT *, CASE variant WHEN 0 THEN 'turtle' WHEN 1 THEN 'ntriples'
                         ELSE 'jsonld' END AS fmt
  FROM base
)
SELECT doc_key, fmt, conv_iri AS subj,
       '<http://example.org/v/turns>' AS pred,
       CASE WHEN fmt = 'jsonld'
            THEN printf('"%d"^^<http://www.w3.org/2001/XMLSchema#decimal>', n_turns)
            ELSE printf('"%d"^^<http://www.w3.org/2001/XMLSchema#integer>', n_turns)
       END AS obj,
       TRUE AS obj_is_literal
FROM fmts
UNION ALL
SELECT doc_key, fmt, conv_iri,
       '<http://example.org/v/kind>', '"' || fmt || '"', TRUE
FROM fmts
""".strip()


def rdf_parse_graphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TriG parse → real named-graph QUADS → SPARQL GRAPH
    query: one synthetic TriG document per conversation with two graph
    blocks (per-role provenance graphs), parsed by the TriG kernel
    inside mapInPandas; the per-graph stats then aggregate through a
    GRAPH ?g block — the quad path exercised end-to-end from document
    text to query answer."""
    from pyspark.sql import functions as F

    from ..operators.parse_spark import parse_rdf_documents, triples_of
    from ..operators.sparql import sparql_select
    from ..sources.transcripts import n_conv_for_sf_dir

    n = n_conv_for_sf_dir(sf_dir)
    base = spark.range(0, n).select(
        F.format_string("conv-%06d", F.col("id")).alias("doc_key"),
        (F.col("id") % 8 + 1).cast("int").alias("n_turns"))
    text = F.format_string(
        "@prefix g: <http://example.org/g/> .\n"
        "@prefix v: <http://example.org/v/> .\n"
        "g:user { <http://example.org/conv/%s> v:turns %d . }\n"
        "g:tool { <http://example.org/conv/%s> v:turns %d . }\n",
        F.col("doc_key"), F.col("n_turns"),
        F.col("doc_key"), F.col("n_turns") % 3)
    docs = base.withColumn("text", text)
    quads = triples_of(parse_rdf_documents(docs, fmt="trig")) \
        .select("graph", "subj", "pred", "obj")
    return sparql_select(quads, """
        SELECT ?g (COUNT(*) AS ?n_triples)
               (COUNT(DISTINCT ?s) AS ?n_subjects)
        WHERE { GRAPH ?g { ?s ?p ?o } } GROUP BY ?g
    """)


def rdf_parse_graphs_oracle_sql(n_conv: int) -> str:
    return f"""
SELECT g, n_triples, n_subjects FROM (
  SELECT '<http://example.org/g/user>' AS g,
         {n_conv}::BIGINT AS n_triples, {n_conv}::BIGINT AS n_subjects
  UNION ALL
  SELECT '<http://example.org/g/tool>',
         {n_conv}::BIGINT, {n_conv}::BIGINT
) t
""".strip()


def kg_entity_link_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-link scoring with an ambiguous candidate dictionary: pick
    the argmax-prior candidate per mention (north star: "batched mention
    detection and entity-link scoring per turn-batch")."""
    from pyspark.sql import functions as F

    from ..operators.linking import detect_mentions, link_scored
    from ..sources.transcripts import n_conv_for_sf_dir, synth_candidates, synth_transcripts

    t = synth_transcripts(spark, n_conv_for_sf_dir(sf_dir))
    best = link_scored(detect_mentions(t), synth_candidates(spark))
    return best.select("conv_id", "turn_idx", "mention_norm",
                       "entity_iri", "score_prior")


def kg_entity_link_scored_oracle_sql(n_conv: int) -> str:
    from ..sources.transcripts import candidates_sql, transcripts_sql
    return f"""
WITH {transcripts_sql(n_conv)},
{candidates_sql()}
SELECT conv_id, turn_idx,
       printf('entity %d', k) AS mention_norm,
       c.entity_iri, c.score_prior
FROM transcripts t
JOIN candidates c ON c.mention_norm = printf('entity %d', t.k)
QUALIFY row_number() OVER (
    PARTITION BY conv_id, turn_idx
    ORDER BY c.score_prior DESC, c.entity_iri ASC) = 1
""".strip()


def rdf_parse_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine path end-to-end: every 4th document is deliberately
    malformed (bad IRI / stray token / broken JSON); parse errors become
    rows with error codes — never job failures. Oracle: pure arithmetic
    over the corruption rule."""
    from pyspark.sql import functions as F

    from ..operators.parse_spark import parse_rdf_documents, quarantine_of
    from ..sources.transcripts import n_conv_for_sf_dir

    n = n_conv_for_sf_dir(sf_dir)
    base = spark.range(0, n).select(
        F.format_string("doc-%06d", F.col("id")).alias("doc_key"),
        (F.col("id") % 4 == 3).alias("broken"),
        (F.col("id") % 8 + 1).cast("int").alias("v"))
    good = F.format_string(
        "<http://example.org/s%d> <http://example.org/p> \"v\" .", F.col("v"))
    bad = F.lit("<relative-iri> <also relative> garbage .")
    docs = base.withColumn("text", F.when(F.col("broken"), bad).otherwise(good))
    parsed = parse_rdf_documents(docs, fmt="ntriples")
    return (quarantine_of(parsed)
            .groupBy("error_code")
            .agg(F.count("*").alias("n_errors"),
                 F.count_distinct("doc_key").alias("n_docs")))


def rdf_parse_quarantine_oracle_sql(n_conv: int) -> str:
    return f"""
SELECT 'ERR_SYNTAX' AS error_code,
       count(*)::BIGINT AS n_errors,
       count(*)::BIGINT AS n_docs
FROM range(0, {n_conv}) r(i) WHERE i % 4 = 3
""".strip()


def kg_partition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition lineage metrics as a query (graph.py's metrics rows,
    but keyed by the cross-engine-portable md5 bucket so DuckDB can
    reproduce them; the store itself uses F.hash for speed)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import _hash64

    t = kg_triples(spark, sf_dir)
    bucketed = t.withColumn(
        "part_id", F.pmod(_hash64(F.col("conv_id")), F.lit(16)).cast("int"))
    return (bucketed.groupBy("part_id")
            .agg(F.count("*").alias("n_rows"),
                 F.count_distinct("subj").alias("n_subjects"),
                 F.count_distinct("conv_id").alias("n_convs")))


def kg_partition_metrics_oracle_sql(n_conv: int) -> str:
    return f"""
WITH base AS ({kg_triples_oracle_sql(n_conv)})
SELECT (md5_number_lower(conv_id) % 16)::INT AS part_id,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT subj)::BIGINT AS n_subjects,
       count(DISTINCT conv_id)::BIGINT AS n_convs
FROM base GROUP BY 1
""".strip()


def kg_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop traversal census over the materialized dual-adjacency graph
    tables (operators/graph.py): degrees aggregate on the bucket columns
    and join co-located (two_hop_census) — the hot-entity fan-out is
    counted as Σ in_deg×out_deg instead of materialized (at sf0.1 the
    naive hop join builds ~112M rows through 81 hot entities; the census
    is linear in |E|). two_hop_edges remains the row-level operator for
    consumers that want the paths themselves."""
    from ..operators.graph import materialize_adjacency, two_hop_census

    # adjacency tables carry only the traversal columns — column pruning
    # at write time, not just read time (the census touches nothing else)
    t = kg_triples(spark, sf_dir).select(
        "subj", "pred", "obj", "obj_is_literal")
    by_subj, by_obj = materialize_adjacency(t, "kg_graph", n_buckets=8)
    return two_hop_census(spark, by_subj, by_obj)


def kg_two_hop_oracle_sql(n_conv: int) -> str:
    return f"""
WITH base AS ({kg_triples_oracle_sql(n_conv)})
SELECT e1.pred AS pred1, e2.pred AS pred2,
       count(*)::BIGINT AS n_paths,
       count(DISTINCT e1.obj)::BIGINT AS n_mid,
       count(DISTINCT e1.subj)::BIGINT AS n_src
FROM base e1 JOIN base e2 ON e1.obj = e2.subj
WHERE NOT e1.obj_is_literal
GROUP BY 1, 2
""".strip()


_QUERY_GRAPH_CACHE: dict = {}


def _query_graph(spark: SparkSession, sf_dir: str,
                 table: str = "kg_query_graph", n_buckets: int = 8):
    """The bucketed graph table shared by every query-layer driver query:
    built ONCE per (sf_dir, buckets) per session — the driver executes
    many queries in one session, and without this cache each would
    re-run the identical extraction + bucketed write (the build is a
    one-time production cost; bench.py times build and query separately
    on its own table)."""
    key = (sf_dir, n_buckets)
    if (_QUERY_GRAPH_CACHE.get(table) == key
            and spark.catalog.tableExists(table)):
        return spark.table(table)
    t = kg_triples(spark, sf_dir).select("subj", "pred", "obj")
    from ..operators.graph import materialize_bucketed
    materialize_bucketed(t, table, n_buckets=n_buckets)
    _QUERY_GRAPH_CACHE[table] = key
    return spark.table(table)


_BGP_PATTERNS = [
    ("?c", "<http://example.org/v/hasTurn>", "?t"),
    ("?t", "<http://example.org/v/role>", '"user"'),
    ("?t", "<http://example.org/v/mentions>", "?e"),
]
_BGP_OPTIONALS = [
    # conversation-opening user turns have no predecessor → null binding
    # (real SPARQL-OPTIONAL semantics exercised in the driver data)
    ("?t", "<http://example.org/v/prevTurn>", "?prev"),
]


def kg_bgp_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-style BGP over the constructed graph: all tool turns with
    their conversation, tool literal, mentioned entity, and OPTIONAL
    previous turn — patterns compiled into constant-filtered self-joins
    plus a left join (operators/query.py); Catalyst reorders and
    broadcasts.

    The graph is MATERIALIZED first (one extraction pass — including the
    single mapInPandas payload parse — into a bucketed table), then every
    pattern scans the table: constant pred filters push into the parquet
    scan, and at 100 TB a k-pattern BGP reads columnar data k times
    instead of re-parsing the corpus k times. Bucketing on subj keeps the
    subject-keyed pattern joins (?t as subject in 3 of the 4 patterns
    here) exchange-free on that side."""
    from ..operators.query import bgp_match

    return bgp_match(_query_graph(spark, sf_dir), _BGP_PATTERNS,
                     optionals=_BGP_OPTIONALS)


def kg_bgp_match_oracle_sql(n_conv: int) -> str:
    from ..operators.query import bgp_sql

    return bgp_sql(_BGP_PATTERNS, kg_triples_oracle_sql(n_conv),
                   optionals=_BGP_OPTIONALS)


_V = "http://example.org/v/"

# seq / one-or-more / alternation / grouping in one expression; inverse
# (^) is exercised in unit tests (tests/test_query_algebra.py)
_PATH_EXPR = (f"<{_V}hasTurn>/<{_V}prevTurn>+"
              f"/(<{_V}mentions>|<{_V}tool>)")


def kg_property_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 property-path query over the materialized graph:
    ``hasTurn/prevTurn+/(mentions|tool)`` — per conversation, every
    entity mentioned (or tool invoked) strictly before some later turn.
    The path compiles to a join/union tree (operators/paths.py) with
    ``+`` lowered onto the path-doubling transitive closure; the graph
    is materialized ONCE into a bucketed table so each path step scans
    columnar data with its pred filter pushed down, never re-running
    the extraction."""
    from pyspark.sql import functions as F

    from ..operators.paths import path_pairs

    # .distinct(): the driver query wants the unique (conv, value) set —
    # path_pairs itself keeps spec bag cardinality for seq/alt (§18.4)
    return (path_pairs(_query_graph(spark, sf_dir), _PATH_EXPR).distinct()
            .select(F.col("src").alias("conv"), F.col("dst").alias("val")))


def kg_property_path_oracle_sql(n_conv: int) -> str:
    from ..operators.paths import path_sql

    inner = path_sql(_PATH_EXPR, kg_triples_oracle_sql(n_conv))
    return f"SELECT DISTINCT src AS conv, dst AS val FROM (\n{inner}\n) pp"


_SPARQL_PATH_STAR = f"""
PREFIX v: <{_V}>
SELECT ?t (COUNT(*) AS ?n_ctx_mentions)
WHERE {{
  ?c v:hasTurn ?t .
  ?t v:prevTurn* ?p .
  ?p v:mentions ?e .
}}
GROUP BY ?t
"""


def kg_sparql_path_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-length path (`*`) through the SPARQL front-end: per turn,
    mentions across its whole predecessor context INCLUDING itself
    (``prevTurn*`` = identity ∪ prevTurn+). The identity component is
    evaluated over the RESTRICTED endpoint set ``?t`` that ``hasTurn``
    already binds — never the node universe (operators/query.py
    _zl_pattern_rel; plan shape asserted in tests/test_query_algebra.py
    and tests/test_sparql.py)."""
    from ..operators.sparql import sparql_select

    return sparql_select(_query_graph(spark, sf_dir), _SPARQL_PATH_STAR)


def kg_sparql_path_star_oracle_sql(n_conv: int) -> str:
    from ..operators.sparql import sparql_sql

    return sparql_sql(_SPARQL_PATH_STAR, kg_triples_oracle_sql(n_conv))


_ALG_BLOCKS = [
    {   # assistant turns past index 3 with their mention, excluding
        # (MINUS) any turn that mentions the hot entity 0; ?tool NULL-pads
        "patterns": [("?c", f"<{_V}hasTurn>", "?t"),
                     ("?t", f"<{_V}role>", '"assistant"'),
                     ("?t", f"<{_V}mentions>", "?e"),
                     ("?t", f"<{_V}index>", "?i")],
        "filters": [("?i", ">", 3)],
        "minus": [("?t", f"<{_V}mentions>", "<http://example.org/e/0>")],
    },
    {   # tool invocations within the first four turns
        "patterns": [("?c", f"<{_V}hasTurn>", "?t"),
                     ("?t", f"<{_V}tool>", "?tool"),
                     ("?t", f"<{_V}index>", "?i")],
        "filters": [("?i", "<=", 3)],
    },
]


def kg_bgp_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL algebra beyond plain BGPs, in one driver query: UNION of
    two blocks, one carrying a numeric FILTER (on the canonical
    xsd:integer literal) and a MINUS (left-anti join on the shared
    variable), the other a FILTER only; results align on the union of
    the blocks' variables with NULL padding (operators/query.py).
    Same materialize-once-then-match shape as kg_bgp_match."""
    from ..operators.query import bgp_union

    return bgp_union(_query_graph(spark, sf_dir), _ALG_BLOCKS)


def kg_bgp_algebra_oracle_sql(n_conv: int) -> str:
    from ..operators.query import bgp_union_sql

    return bgp_union_sql(_ALG_BLOCKS, kg_triples_oracle_sql(n_conv))


_SPARQL_SELECT = """
PREFIX v: <http://example.org/v/>
SELECT ?e (COUNT(?t) AS ?n_turns) (MIN(?i) AS ?first_idx)
       (MAX(?i) AS ?last_idx)
WHERE {
  ?c v:hasTurn ?t .
  ?t v:mentions ?e ;
     v:index ?i .
  FILTER(?i > 0)
}
GROUP BY ?e
"""

_SPARQL_CONSTRUCT = """
PREFIX v: <http://example.org/v/>
CONSTRUCT { ?c v:hasEntity ?e . ?e v:usedWith ?tool }
WHERE {
  ?c v:hasTurn ?t .
  ?t v:mentions ?e .
  OPTIONAL { ?t v:tool ?tool }
}
"""


def kg_sparql_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real SPARQL SELECT string — prefixes, predicate-object lists,
    FILTER, GROUP BY with COUNT/MIN/MAX — parsed and executed through the
    algebra layer (operators/sparql.py) over the materialized bucketed
    graph table: per-entity mention stats over non-opening turns."""
    from ..operators.sparql import sparql_select

    return sparql_select(_query_graph(spark, sf_dir), _SPARQL_SELECT)


def kg_sparql_select_oracle_sql(n_conv: int) -> str:
    from ..operators.sparql import sparql_sql

    return sparql_sql(_SPARQL_SELECT, kg_triples_oracle_sql(n_conv))


def kg_sparql_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT — graph-to-graph enrichment: lift turn-level
    mention edges to conversation level and link entities to the tools
    of the turns that mention them (unbound ?tool instantiations drop,
    per SPARQL semantics). Output is a canonical subj/pred/obj triple
    set, directly materializable back through operators/graph.py."""
    from ..operators.sparql import sparql_select

    return sparql_select(_query_graph(spark, sf_dir), _SPARQL_CONSTRUCT)


def kg_sparql_construct_oracle_sql(n_conv: int) -> str:
    from ..operators.sparql import sparql_sql

    return sparql_sql(_SPARQL_CONSTRUCT, kg_triples_oracle_sql(n_conv))


_SPARQL_DESCRIBE = """
PREFIX v: <http://example.org/v/>
PREFIX e: <http://example.org/e/>
DESCRIBE ?c WHERE { ?c v:hasTurn ?t . ?t v:mentions e:0 }
"""


def kg_sparql_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE — every triple about the conversations that
    mention the hot entity (subject-role description, the scalable
    semi-join shape): the match is a pattern query, the description a
    left-semi join back into the graph table."""
    from ..operators.sparql import sparql_select

    return sparql_select(_query_graph(spark, sf_dir), _SPARQL_DESCRIBE)


def kg_sparql_describe_oracle_sql(n_conv: int) -> str:
    from ..operators.sparql import sparql_sql

    return sparql_sql(_SPARQL_DESCRIBE, kg_triples_oracle_sql(n_conv))


_SPARQL_BUILTINS = """
PREFIX v: <http://example.org/v/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
SELECT ?e (GROUP_CONCAT(DISTINCT ?tool; SEPARATOR="|") AS ?tools)
       (SAMPLE(?t) AS ?sample_turn) (COUNT(*) AS ?n_tool_turns)
       (MAX(?i) AS ?max_idx)
WHERE {
  ?t v:mentions ?e ;
     v:tool ?tool ;
     v:at ?at ;
     v:index ?i .
  VALUES ?tool { "search" "code" }
  FILTER(DATATYPE(?at) = xsd:dateTime)
  FILTER(CONTAINS(?tool, "e"))
  FILTER(LANG(?tool) != "en")
  FILTER(EXISTS { ?t v:prevTurn ?p })
}
GROUP BY ?e
ORDER BY DESC(?n_tool_turns) ?e
"""


def kg_sparql_builtins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL FILTER built-ins + string aggregates end-to-end in one
    per-entity tool profile (merges the former kg_sparql_entity_tools
    driver entry): VALUES inline restriction, DATATYPE on the canonical
    dateTime literal, CONTAINS over the STR lexical form, LANG on an
    untagged literal (extracts '' → the != keeps the row), a correlated
    FILTER EXISTS semi join (turns with a predecessor), GROUP_CONCAT
    (DISTINCT; sorted — the cross-engine determinism rule), and a
    deterministic SAMPLE. All built-ins evaluate as JVM column
    expressions over the canonical term strings; the DuckDB twin uses
    the identical regex extractions.

    Multi-pattern → materialize-once-then-match (the kg_bgp_match
    lesson: constant pred filters cannot prune the extraction's
    data-dependent union branches, so each pattern would otherwise
    re-run the Python payload parse)."""
    from ..operators.sparql import sparql_select

    return sparql_select(_query_graph(spark, sf_dir), _SPARQL_BUILTINS)


def kg_sparql_builtins_oracle_sql(n_conv: int) -> str:
    from ..operators.sparql import sparql_sql

    return sparql_sql(_SPARQL_BUILTINS, kg_triples_oracle_sql(n_conv))


_SPARQL_SUBQUERY = """
PREFIX v: <http://example.org/v/>
SELECT ?c ?e WHERE {
  ?c v:hasTurn ?t .
  ?t v:mentions ?e .
  { SELECT ?c WHERE { ?c v:hasTurn ?t2 } GROUP BY ?c
    HAVING(COUNT(?t2) >= 6) }
}
"""


def kg_sparql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested { SELECT }: entity mentions restricted to LONG
    conversations, where the keyset (conversations with ≥6 turns) is
    computed by an aggregating subquery and joined on ?c — the classic
    SPARQL nested-aggregation shape, evaluated bottom-up and joined as
    a DataFrame equi-join (Catalyst broadcasts the small keyset)."""
    from ..operators.sparql import sparql_select

    return sparql_select(_query_graph(spark, sf_dir), _SPARQL_SUBQUERY)


def kg_sparql_subquery_oracle_sql(n_conv: int) -> str:
    from ..operators.sparql import sparql_sql

    return sparql_sql(_SPARQL_SUBQUERY, kg_triples_oracle_sql(n_conv))


_SPARQL_GRAPH_Q = """
PREFIX v: <http://example.org/v/>
SELECT ?g (COUNT(*) AS ?n_mentions) (COUNT(DISTINCT ?e) AS ?n_entities)
WHERE { GRAPH ?g { ?t v:mentions ?e } }
GROUP BY ?g
"""


def kg_graph_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL GRAPH (quad) query over provenance named graphs: each
    conversation's triples are placed in the named graph <conv IRI> (the
    standard per-source provenance layout), then mention counts
    aggregate per graph through a GRAPH ?g block. Single pattern → the
    quads are queried directly off the extraction (one scan); the graph
    column rides the same partitioning as conv_id, so the GROUP BY ?g is
    skew-free by construction."""
    from pyspark.sql import functions as F

    from ..operators.sparql import sparql_select

    t = kg_triples(spark, sf_dir)
    quads = t.withColumn(
        "graph", F.concat(F.lit(f"<{CONV_NS}"), F.col("conv_id"),
                          F.lit(">")))
    return sparql_select(quads.select("graph", "subj", "pred", "obj"),
                         _SPARQL_GRAPH_Q)


def kg_graph_provenance_oracle_sql(n_conv: int) -> str:
    from ..operators.sparql import sparql_sql

    base = (f"SELECT '<{CONV_NS}' || conv_id || '>' AS graph, "
            f"subj, pred, obj FROM ({kg_triples_oracle_sql(n_conv)}) kt")
    return sparql_sql(_SPARQL_GRAPH_Q, base)


def kg_turn_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property-path query pred+ over the graph: transitive closure of
    prevTurn with shortest hop distance — each turn reaches every earlier
    turn of its conversation (operators/components.transitive_closure:
    semi-naive iterative joins, recursive-CTE oracle)."""
    from pyspark.sql import functions as F

    from ..operators.components import transitive_closure

    t = kg_triples(spark, sf_dir)
    edges = (t.filter(F.col("pred") == "<http://example.org/v/prevTurn>")
             .select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    return transitive_closure(edges)


def kg_turn_reachability_oracle_sql(n_conv: int) -> str:
    from ..operators.components import transitive_closure_oracle

    edges_sql = (f"SELECT subj AS src, obj AS dst FROM "
                 f"({kg_triples_oracle_sql(n_conv)}) "
                 f"WHERE pred = '<http://example.org/v/prevTurn>'")
    return transitive_closure_oracle(edges_sql)


def kg_triples_oracle_sql(n_conv: int) -> str:
    """Arithmetic oracle for ``kg_triples`` (DuckDB dialect)."""
    return f"""
WITH {transcripts_sql(n_conv)},
t AS (
  SELECT *,
    '_:b' || substr(sha256(conv_id || '|' || turn_idx::VARCHAR), 1, 16) AS bnode,
    '<http://example.org/conv/' || conv_id || '>' AS conv_iri
  FROM transcripts
)
SELECT conv_iri AS subj, '<http://example.org/v/hasTurn>' AS pred,
       bnode AS obj, FALSE AS obj_is_literal,
       CAST(NULL AS VARCHAR) AS graph, conv_id, turn_idx FROM t
UNION ALL
SELECT bnode, '<http://example.org/v/role>', '"' || role || '"',
       TRUE, NULL, conv_id, turn_idx FROM t
UNION ALL
SELECT bnode, '<http://example.org/v/index>',
       printf('"%d"^^<http://www.w3.org/2001/XMLSchema#integer>', turn_idx),
       TRUE, NULL, conv_id, turn_idx FROM t
UNION ALL
SELECT bnode, '<http://example.org/v/at>',
       '"' || strftime(ts, '%Y-%m-%dT%H:%M:%SZ') || '"^^<http://www.w3.org/2001/XMLSchema#dateTime>',
       TRUE, NULL, conv_id, turn_idx FROM t
UNION ALL
SELECT bnode, '<http://example.org/v/tool>', '"' || tool || '"',
       TRUE, NULL, conv_id, turn_idx FROM t WHERE tool <> ''
UNION ALL
SELECT bnode, '<http://example.org/v/prevTurn>',
       '_:b' || substr(sha256(conv_id || '|' || (turn_idx - 1)::VARCHAR), 1, 16),
       FALSE, NULL, conv_id, turn_idx FROM t WHERE turn_idx > 0
UNION ALL
SELECT bnode, '<http://example.org/v/mentions>',
       printf('<http://example.org/e/%d>', k), FALSE, NULL, conv_id, turn_idx FROM t
UNION ALL
SELECT printf('<http://example.org/e/%d>', k),
       '<http://example.org/rel/mentions>', printf('"entity %d"', k),
       TRUE, NULL, conv_id, turn_idx FROM t WHERE (i + turn_idx) % 5 = 0
""".strip()
