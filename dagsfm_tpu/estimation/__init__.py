"""Global estimation: rotation averaging + orientation filtering
(reference: src/rotation_estimation, src/sfm/filter_view_pairs_from_orientation)."""
