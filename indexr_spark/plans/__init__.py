"""Plan-level helpers: the rough-check predicate algebra (file pruning)."""
