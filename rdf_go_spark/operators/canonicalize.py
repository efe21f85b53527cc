"""Canonicalization stage: normalize triple term strings exactly per the
kernel's rules (escape whitelist, c14n quoting, lang-tag lowercasing,
xsd:string dropping — terms.py), as a distributed operator.

The pipeline's extraction emits canonical strings already; this stage is
the enforcement boundary for EXTERNAL triple sources (parse_spark output,
user-supplied graph tables): re-parse every term through the kernel and
re-render. Idempotent by construction — canonical(canonical(x)) == x —
asserted in tests and by the kg_canonical_roundtrip driver query.

Bad terms become quarantine rows instead of failures, mirroring
parse_spark's contract.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, IntegerType, StringType, StructField, StructType,
)

CANON_SCHEMA = StructType([
    StructField("subj", StringType(), True),
    StructField("pred", StringType(), True),
    StructField("obj", StringType(), True),
    StructField("obj_is_literal", BooleanType(), True),
    StructField("graph", StringType(), True),
    StructField("conv_id", StringType(), True),
    StructField("turn_idx", IntegerType(), True),
    StructField("error_code", StringType(), True),
])


def _canon_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..parsers.ntriples import parse_nquads_line
    from ..terms import Literal, ParseError, render_term

    for pdf in batches:
        out = {k: [] for k in ("subj", "pred", "obj", "obj_is_literal",
                               "graph", "conv_id", "turn_idx", "error_code")}
        for subj, pred, obj, graph, conv_id, turn_idx in zip(
                pdf["subj"], pdf["pred"], pdf["obj"], pdf["graph"],
                pdf["conv_id"], pdf["turn_idx"]):
            line = f"{subj} {pred} {obj}" + \
                (f" {graph}" if graph is not None and graph == graph and graph else "") + " ."
            try:
                q = parse_nquads_line(line)
            except ParseError as e:
                out["subj"].append(None)
                out["pred"].append(None)
                out["obj"].append(None)
                out["obj_is_literal"].append(None)
                out["graph"].append(None)
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(int(turn_idx))
                out["error_code"].append(e.code)
                continue
            out["subj"].append(render_term(q.s))
            out["pred"].append(render_term(q.p))
            out["obj"].append(render_term(q.o))
            out["obj_is_literal"].append(isinstance(q.o, Literal))
            out["graph"].append(None if q.g is None else render_term(q.g))
            out["conv_id"].append(conv_id)
            out["turn_idx"].append(int(turn_idx))
            out["error_code"].append(None)
        yield pd.DataFrame(out)


def canonicalize_triples(triples: DataFrame) -> DataFrame:
    """Re-canonicalize (subj, pred, obj, graph) term strings; quarantine
    unparseable rows via error_code."""
    src = triples.select("subj", "pred", "obj", "graph", "conv_id",
                         "turn_idx")
    return src.mapInPandas(_canon_batches, schema=CANON_SCHEMA)


def canonical_only(canon: DataFrame) -> DataFrame:
    return canon.filter(F.col("error_code").isNull()).drop("error_code")
