"""Graph layer: view graph, union-find, similarity graphs
(reference: src/graph)."""
