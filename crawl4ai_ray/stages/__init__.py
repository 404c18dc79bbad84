"""Ray Data pipeline stages (map_batches callables and actor classes)."""
