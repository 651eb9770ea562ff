"""Top-level pipeline controllers + CLI (reference: src/controllers,
src/exe/colmap.cc)."""
