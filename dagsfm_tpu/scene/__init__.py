"""Scene model & storage (reference: src/base)."""
