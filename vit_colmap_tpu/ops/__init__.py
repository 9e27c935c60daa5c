"""Device compute ops: matching, detection, scoring, RANSAC, SIFT, sampling.

Import leaf modules directly (``from vit_colmap_tpu.ops import matching``);
no eager re-exports here — ransac depends on sfm.geometry and eager imports
would create package cycles.
"""
