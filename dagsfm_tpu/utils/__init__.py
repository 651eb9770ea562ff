"""Runtime utilities: timing, progress, options (reference: src/util)."""
