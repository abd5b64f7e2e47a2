"""Query packs — each module exposes a REGISTRY of name -> (fn, oracle_sql)."""
