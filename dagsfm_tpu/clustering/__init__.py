"""Scene partitioning: spectral / community clustering + cut-and-expand
driver (reference: src/clustering)."""
