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


def parse(text: str, format: str = None, base: str = ""):
    """The reference's two-call user API, Python-shaped
    (rdf/api.go:77 Parse with auto-detection at api.go:229): parse an
    RDF document in any of the six formats (auto-detected when
    ``format`` is None) into (statements, errors, format_used).
    Errors are quarantine records, never exceptions — the push-handler
    contract. Pure Python: no JVM needed."""
    from .parsers.detect import parse_any
    return parse_any(text, fmt=format, base=base)


def encode(statements, format: str = "ntriples", **kwargs) -> str:
    """Serialize statements to any of the six formats (rdf/api.go:114
    NewWriter): canonical N-Triples/N-Quads lines, deterministic
    Turtle/TriG with sorted prefixes, RDF/XML, JSON-LD."""
    from . import encoders
    fns = {
        "ntriples": encoders.encode_ntriples,
        "nquads": encoders.encode_nquads,
        "turtle": encoders.encode_turtle,
        "trig": encoders.encode_trig,
        "jsonld": encoders.encode_jsonld,
        "rdfxml": encoders.encode_rdfxml,
    }
    if format not in fns:
        raise ValueError(f"unknown format {format!r} (have {sorted(fns)})")
    return fns[format](statements, **kwargs)


def sparql(triples, query: str):
    """Run a SPARQL SELECT / CONSTRUCT / ASK / DESCRIBE string over a
    triples or quads DataFrame (canonical ``subj``/``pred``/``obj``
    [, ``graph``] columns). Lazy import so the pure-Python parser layer
    stays importable without a JVM."""
    from .operators.sparql import sparql_select
    return sparql_select(triples, query)


def update(triples, update_str: str):
    """Apply a SPARQL UPDATE string (INSERT DATA / DELETE DATA /
    DELETE WHERE / DELETE {} INSERT {} WHERE {}, ';'-sequenced) to a
    triples DataFrame and return the post-update graph. Write it back
    through ``operators.graph.incremental_update`` to rewrite only the
    partitions the delta touched (scripts/run_pipeline.py --update)."""
    from .operators.sparql import sparql_update
    return sparql_update(triples, update_str)
