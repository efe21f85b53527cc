from .pipeline import kg_triples, kg_triples_oracle_sql  # noqa: F401
