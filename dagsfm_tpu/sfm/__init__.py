"""Reconstruction engines: BA, incremental mapper, triangulator, aligner
(reference: src/sfm, src/controllers, src/optim)."""
