"""DuckDB oracle SQL builders, parameterized by transcript scale so both
the driver (n_conv=2000 at sf0.01) and pytest (n_conv=50 smoke) can use them.
"""

from __future__ import annotations

from ..sources.transcripts import transcripts_sql
from .pipeline import (
    kg_bgp_algebra_oracle_sql, kg_entity_link_scored_oracle_sql,
    kg_export_ntriples_oracle_sql, kg_partition_metrics_oracle_sql,
    kg_graph_provenance_oracle_sql, kg_property_path_oracle_sql,
    kg_sparql_builtins_oracle_sql, kg_sparql_construct_oracle_sql,
    kg_sparql_describe_oracle_sql, kg_sparql_path_star_oracle_sql,
    kg_sparql_select_oracle_sql, kg_sparql_subquery_oracle_sql,
    kg_triples_oracle_sql,
    kg_bgp_match_oracle_sql, kg_turn_reachability_oracle_sql,
    kg_two_hop_oracle_sql, rdf_parse_graphs_oracle_sql,
    rdf_parse_multiformat_oracle_sql,
    rdf_parse_quarantine_oracle_sql,
)


def kg_oracles(n_conv: int) -> dict[str, str]:
    return {
        "kg_triples": kg_triples_oracle_sql(n_conv),
        "kg_export_ntriples": kg_export_ntriples_oracle_sql(n_conv),
        "rdf_parse_multiformat": rdf_parse_multiformat_oracle_sql(n_conv),
        "rdf_parse_quarantine": rdf_parse_quarantine_oracle_sql(n_conv),
        "rdf_parse_graphs": rdf_parse_graphs_oracle_sql(n_conv),
        "kg_partition_metrics": kg_partition_metrics_oracle_sql(n_conv),
        "kg_entity_link_scored": kg_entity_link_scored_oracle_sql(n_conv),
        "kg_two_hop": kg_two_hop_oracle_sql(n_conv),
        "kg_bgp_match": kg_bgp_match_oracle_sql(n_conv),
        "kg_property_path": kg_property_path_oracle_sql(n_conv),
        "kg_bgp_algebra": kg_bgp_algebra_oracle_sql(n_conv),
        "kg_sparql_select": kg_sparql_select_oracle_sql(n_conv),
        "kg_sparql_construct": kg_sparql_construct_oracle_sql(n_conv),
        "kg_sparql_describe": kg_sparql_describe_oracle_sql(n_conv),
        "kg_graph_provenance": kg_graph_provenance_oracle_sql(n_conv),
        "kg_sparql_builtins": kg_sparql_builtins_oracle_sql(n_conv),
        "kg_sparql_subquery": kg_sparql_subquery_oracle_sql(n_conv),
        "kg_sparql_path_star": kg_sparql_path_star_oracle_sql(n_conv),
        "kg_turn_reachability": kg_turn_reachability_oracle_sql(n_conv),
        "kg_conversation_stats": f"""
WITH {transcripts_sql(n_conv)}
SELECT conv_id,
       COUNT(*)::BIGINT AS n_turns,
       COUNT(DISTINCT role)::BIGINT AS n_roles,
       SUM(length(text))::BIGINT AS total_chars,
       strftime(MAX(ts), '%Y-%m-%dT%H:%M:%SZ') AS last_ts
FROM transcripts GROUP BY conv_id
""".strip(),
        "kg_entity_mentions": f"""
WITH {transcripts_sql(n_conv)}
SELECT printf('<http://example.org/e/%d>', k) AS entity_iri,
       COUNT(*)::BIGINT AS n_mentions,
       COUNT(DISTINCT conv_id)::BIGINT AS n_convs
FROM transcripts GROUP BY k
""".strip(),
        "kg_turn_text_roundtrip": f"""
WITH {transcripts_sql(n_conv)}
SELECT conv_id, turn_idx, role, text, tool,
       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso
FROM transcripts
""".strip(),
    }
