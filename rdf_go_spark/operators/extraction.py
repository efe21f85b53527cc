"""Triple extraction + entity linking over the transcript table.

Spark-first design notes (scale target: 10^12 turns):
- Every structural rule is a pure column expression (whole-stage codegen,
  no Python). The only Python on the hot path is the embedded-RDF payload
  parse, which runs as an Arrow-batched ``mapInPandas`` over the ~20% of
  turns that carry a payload (pre-filtered JVM-side with ``contains``).
- Entity linking is a broadcast join against the (tiny) entity dictionary —
  no shuffle of the fact side. For dictionaries beyond the broadcast
  threshold the same call degrades gracefully to a shuffle join where AQE
  skew-splitting (enabled in session.py) handles the hot-entity key; we
  additionally expose an explicit salting variant in linking.py.
- Blank nodes are deterministically skolemized as
  ``_:b<sha256(conv_id|turn_idx)[:16]>`` — replaces the reference's
  sequential counter (rdf/common_utils.go:7-32), which cannot distribute.
  (sha256 rather than sha1 so the DuckDB oracle can reproduce it.)
- prev-turn adjacency uses a window (lag) under stable (conv_id, turn_idx)
  ordering — the input-hint invariant.

Output schema (FIXTURES.md §2):
  subj, pred, obj: canonical N-Triples term strings
  obj_is_literal: boolean
  graph: string (null = default graph)
  conv_id, turn_idx: provenance keys
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, IntegerType, StringType, StructField, StructType,
)

V_NS = "http://example.org/v/"
CONV_NS = "http://example.org/conv/"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DATETIME = "http://www.w3.org/2001/XMLSchema#dateTime"

TRIPLE_SCHEMA = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("obj_is_literal", BooleanType(), False),
    StructField("graph", StringType(), True),
    StructField("conv_id", StringType(), False),
    StructField("turn_idx", IntegerType(), False),
])


def _skolem_bnode(conv_id, turn_idx):
    """Deterministic blank-node label; distributable, oracle-reproducible."""
    return F.concat(
        F.lit("_:b"),
        F.substring(F.sha2(F.concat_ws("|", conv_id, turn_idx), 256), 1, 16))


def _rule(df: DataFrame, subj, pred: str, obj, is_literal: bool) -> DataFrame:
    return df.select(
        subj.alias("subj"),
        F.lit(f"<{pred}>").alias("pred"),
        obj.alias("obj"),
        F.lit(is_literal).alias("obj_is_literal"),
        F.lit(None).cast("string").alias("graph"),
        F.col("conv_id"),
        F.col("turn_idx"),
    )


def _parse_payload_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched parse of embedded N-Triples payloads in turn text.

    Uses the real kernel parser (parsers/ntriples.py); one input row can
    emit many triple rows (the reference's pending-queue shape,
    rdf/turtle_parser.go:46-51, reborn as a row explosion)."""
    from ..parsers.ntriples import parse_document
    from ..terms import Literal

    for pdf in batches:
        out = {k: [] for k in ("subj", "pred", "obj", "obj_is_literal",
                               "graph", "conv_id", "turn_idx")}
        for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"],
                                           pdf["text"]):
            # accept either a payload pre-sliced JVM-side (starts with
            # the statement — extract_triples ships only the payload
            # bytes across the Arrow boundary, guide §4) or a full turn
            # text to scan
            if not text.startswith("<http"):
                idx = text.find(" <http")
                if idx < 0:
                    continue
                text = text[idx + 1:]
            stmts, _errs = parse_document(text)
            from ..terms import render_term
            for st in stmts:
                out["subj"].append(render_term(st.s))
                out["pred"].append(render_term(st.p))
                out["obj"].append(render_term(st.o))
                out["obj_is_literal"].append(isinstance(st.o, Literal))
                out["graph"].append(None)
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(int(turn_idx))
        yield pd.DataFrame(out)


def extract_triples(transcripts: DataFrame, entities: Optional[DataFrame] = None,
                    include_payload: bool = True,
                    include_prev_turn: bool = True) -> DataFrame:
    """Full extraction: structural rules ∪ entity links ∪ embedded payloads.

    Shape note (r6): a fused explode-of-struct-array variant (all five
    structural rules in one pass) was measured SLOWER than this union
    for both count() and full materialization — the per-branch
    generator/sha2 re-evaluation is cheaper than building+filtering an
    array of structs per row, and the union lets Catalyst prune unused
    branches column-wise. Kept as-is deliberately."""
    t = (
        transcripts
        .withColumn("bnode", _skolem_bnode(F.col("conv_id"), F.col("turn_idx")))
        .withColumn("conv_iri",
                    F.concat(F.lit(f"<{CONV_NS}"), F.col("conv_id"), F.lit(">")))
    )

    bnode = F.col("bnode")
    conv_iri = F.col("conv_iri")

    parts = [
        # conv --hasTurn--> turn bnode
        _rule(t, conv_iri, V_NS + "hasTurn", bnode, False),
        # turn --role--> "user"
        _rule(t, bnode, V_NS + "role",
              F.concat(F.lit('"'), F.col("role"), F.lit('"')), True),
        # turn --index--> "0"^^xsd:integer
        _rule(t, bnode, V_NS + "index",
              F.format_string('"%d"^^<%s>', F.col("turn_idx"),
                              F.lit(XSD_INTEGER)), True),
        # turn --at--> "2026-01-01T00:00:00Z"^^xsd:dateTime
        _rule(t, bnode, V_NS + "at",
              F.format_string('"%s"^^<%s>',
                              F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
                              F.lit(XSD_DATETIME)), True),
    ]

    # tool rule only where a tool is set
    tool_rows = t.filter(F.col("tool") != "")
    parts.append(_rule(tool_rows, F.col("bnode"), V_NS + "tool",
                       F.concat(F.lit('"'), F.col("tool"), F.lit('"')), True))

    # prev-turn adjacency via window lag under stable turn ordering
    # (batch only — unbounded windows are not streamable). Only the
    # three columns the rule needs enter the window's exchange.
    if include_prev_turn:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        prev = (t.select("conv_id", "turn_idx", "bnode")
                .withColumn("prev_bnode", F.lag("bnode").over(w))
                .filter(F.col("prev_bnode").isNotNull()))
        parts.append(_rule(prev, F.col("bnode"), V_NS + "prevTurn",
                           F.col("prev_bnode"), False))

    # entity linking: mention detection (JVM regex) + broadcast dict join
    if entities is not None:
        mentions = (
            t.withColumn("mention_norm",
                         F.concat(F.lit("entity "),
                                  F.regexp_extract("text", r"entity ([0-9]+)", 1)))
            .filter(F.col("mention_norm") != "entity ")
            .join(F.broadcast(entities), "mention_norm", "inner")
        )
        parts.append(_rule(mentions, F.col("bnode"), V_NS + "mentions",
                           F.concat(F.lit("<"), F.col("entity_iri"), F.lit(">")),
                           False))

    # embedded RDF payload: pre-filter AND pre-slice JVM-side so only
    # the payload bytes cross the Arrow boundary (guide §4: pass only
    # the columns/bytes the function needs); parse with the kernel
    if include_payload:
        payload_rows = transcripts.filter(F.col("text").contains(" <http"))
        payload = F.expr("substring(text, instr(text, ' <http') + 1)")
        parsed = payload_rows.select("conv_id", "turn_idx",
                                     payload.alias("text")) \
            .mapInPandas(_parse_payload_batches, schema=TRIPLE_SCHEMA)
        parts.append(parsed)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
