"""DataFrame-level operators (compositions of built-in Spark ops)."""
