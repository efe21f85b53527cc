"""rdf_go_spark — a from-scratch PySpark-native knowledge-graph construction
engine with the parse-to-triple capabilities of geoknoesis/rdf-go.

Layout:
  terms      — pure-Python RDF 1.1/1.2 term kernel (render/unescape/resolve)
  parsers    — per-format parse kernels (N-Triples, N-Quads, Turtle, TriG,
               JSON-LD, RDF/XML) + format auto-detection
  encoders   — canonical serializers for the six formats
  sources    — transcript synthesis + table registry
  operators  — Spark operators: mapInPandas parse, extraction, entity
               linking, canonicalization, graph materialization, dedup,
               similarity, text stats, multimodal plumbing
  plans      — end-to-end pipeline assembly
  streaming  — Structured Streaming variant
"""

__version__ = "0.1.0"


def sparql(triples, query: str):
    """Run a SPARQL SELECT / CONSTRUCT / ASK / DESCRIBE string over a
    triples or quads DataFrame (canonical ``subj``/``pred``/``obj``
    [, ``graph``] columns). Lazy import so the pure-Python parser layer
    stays importable without a JVM."""
    from .operators.sparql import sparql_select
    return sparql_select(triples, query)
