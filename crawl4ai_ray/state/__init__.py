"""Shared mutable state: bloom filters, politeness state, checkpoints."""
