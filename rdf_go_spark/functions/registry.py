"""Spark SQL registration of the RDF scalar kernels.

``register_rdf_functions(spark)`` exposes the library's term/parse
kernels to plain ``spark.sql`` users (the reference's public scalar API
surface — format detection rdf/format_detect.go, RFC 3986 resolution,
strict IRI validation, parse + canonical N-Triples re-serialization).

These are row-at-a-time Python UDFs by design: they exist for SQL
interop and exploration, NOT for the hot path — the pipeline operators
use column expressions / Arrow-batched mapInPandas throughout (see
operators/). The docstring of each UDF body keeps the semantics in one
place; the heavy work per row is identical to what the distributed
parse operator does per document.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_rdf_functions(spark: SparkSession) -> None:
    from ..encoders import render_ntriples_line
    from ..parsers.detect import detect_format, parse_any
    from ..terms import resolve_iri, validate_iri_strict

    def _detect(text):
        return detect_format(text) if text is not None else None

    def _resolve(base, rel):
        try:
            return resolve_iri(base or "", rel or "")
        except Exception:
            return None

    def _valid_iri(iri):
        if iri is None:
            return None
        return validate_iri_strict(iri) is None  # None = no error

    def _count(text, fmt=None):
        if text is None:
            return None
        stmts, errs, _ = parse_any(text, fmt=fmt)
        return len(stmts) if not errs else -1

    def _to_nt(text, fmt=None):
        """Parse any supported format, re-serialize as canonical
        N-Triples lines (sorted); None on parse error."""
        if text is None:
            return None
        stmts, errs, _ = parse_any(text, fmt=fmt)
        if errs:
            return None
        return "\n".join(sorted(render_ntriples_line(q) for q in stmts))

    spark.udf.register("rdf_detect_format", _detect, "string")
    spark.udf.register("iri_resolve", _resolve, "string")
    spark.udf.register("iri_is_valid", _valid_iri, "boolean")
    spark.udf.register("rdf_statement_count", _count, "int")
    spark.udf.register("rdf_to_ntriples", _to_nt, "string")
