"""Structure-from-motion: geometry, PnP, bundle adjustment, incremental
mapper, reconstruction data model + COLMAP IO.

``incremental_mapping`` is imported lazily by the pipeline (it pulls in the
matching driver); import it from ``vit_colmap_tpu.sfm.incremental``.
"""

from vit_colmap_tpu.sfm.reconstruction import (  # noqa: F401
    Camera,
    Image,
    Point3D,
    Reconstruction,
    read_text,
)
