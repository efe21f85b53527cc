"""End-to-end KG-construction pipeline assembly + DuckDB oracle SQL.

The flagship job (north rule): transcripts → triple extraction → entity
linking → canonicalization → graph table. The oracle SQL reproduces the
expected triple set with pure arithmetic over the same deterministic
generator — a fully independent check of the Spark path (window ordering,
broadcast join, skolemization, payload parsing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extraction import extract_triples
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
