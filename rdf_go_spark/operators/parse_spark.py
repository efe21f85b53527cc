"""Distributed RDF parsing: documents DataFrame → triples DataFrame.

The Spark face of the parser kernels (SURVEY.md §3.1 re-expression):
one document per input row, parsed inside an Arrow-batched
``mapInPandas`` with format auto-detection (reference: Parse + NewReader
dispatch, rdf/api.go:77-111,255-309). Parse failures become quarantine
ROWS (error_code/error_line columns), not job failures — the Spark
replacement for the reference's sticky decoder error (rdf/errors.go).

Blank nodes are deterministically skolemized per document:
``b_<sha256(doc_key|seq)[:16]>`` — the distributed replacement for the
reference's global counter (rdf/common_utils.go:7-32).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, IntegerType, StringType, StructField, StructType,
)

PARSED_SCHEMA = StructType([
    StructField("doc_key", StringType(), False),
    StructField("fmt", StringType(), True),
    StructField("subj", StringType(), True),
    StructField("pred", StringType(), True),
    StructField("obj", StringType(), True),
    StructField("obj_is_literal", BooleanType(), True),
    StructField("graph", StringType(), True),
    StructField("error_code", StringType(), True),
    StructField("error_line", IntegerType(), True),
    StructField("error_msg", StringType(), True),
])


def _skolem_factory(doc_key: str):
    from ..terms import BlankNode
    seq = [0]

    def gen() -> BlankNode:
        seq[0] += 1
        h = hashlib.sha256(f"{doc_key}|{seq[0]}".encode()).hexdigest()[:16]
        return BlankNode(f"b_{h}")
    return gen


def _parse_batches(fmt: Optional[str], base: str, skolemize: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..parsers.detect import parse_any
        from ..terms import Literal, render_term

        cols = [f.name for f in PARSED_SCHEMA.fields]
        for pdf in batches:
            out = {c: [] for c in cols}

            def push(key, fmt_used, s=None, p=None, o=None, lit=None,
                     g=None, ec=None, el=None, em=None):
                out["doc_key"].append(key)
                out["fmt"].append(fmt_used)
                out["subj"].append(s)
                out["pred"].append(p)
                out["obj"].append(o)
                out["obj_is_literal"].append(lit)
                out["graph"].append(g)
                out["error_code"].append(ec)
                out["error_line"].append(el)
                out["error_msg"].append(em)

            for key, text in zip(pdf["doc_key"], pdf["text"]):
                key = str(key)
                bnf = _skolem_factory(key) if skolemize else None
                stmts, errs, used = parse_any(str(text), fmt=fmt, base=base,
                                              bnode_factory=bnf)
                for st in stmts:
                    push(key, used,
                         render_term(st.s), render_term(st.p),
                         render_term(st.o), isinstance(st.o, Literal),
                         None if st.g is None else render_term(st.g))
                for e in errs:
                    push(key, used or None, ec=e.code,
                         el=int(e.line) if e.line else None,
                         em=e.message[:200])
            yield pd.DataFrame(out)
    return fn


def parse_rdf_documents(docs: DataFrame, fmt: Optional[str] = None,
                        doc_key_col: str = "doc_key",
                        text_col: str = "text", base: str = "",
                        skolemize: bool = True) -> DataFrame:
    """Parse each row's ``text_col`` as an RDF document.

    Returns the full schema incl. quarantine columns; split with
    ``triples_of`` / ``quarantine_of``.
    """
    src = docs.select(F.col(doc_key_col).cast("string").alias("doc_key"),
                      F.col(text_col).alias("text"))
    return src.mapInPandas(_parse_batches(fmt, base, skolemize),
                           schema=PARSED_SCHEMA)


def triples_of(parsed: DataFrame) -> DataFrame:
    return (parsed.filter(F.col("error_code").isNull())
            .drop("error_code", "error_line", "error_msg"))


def quarantine_of(parsed: DataFrame) -> DataFrame:
    return (parsed.filter(F.col("error_code").isNotNull())
            .select("doc_key", "fmt", "error_code", "error_line", "error_msg"))
