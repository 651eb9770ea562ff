"""Feature pipeline: SIFT extraction, matching, verification, retrieval
(reference: src/feature, src/retrieval)."""
