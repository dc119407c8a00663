"""Geometry helpers for the examples.

Thin re-exports of the package's vectorized geometry helpers
(htool_python_tpu/models/geometry.py), keeping the reference's example-file
layout and names (reference: example/create_geometry.py) so its workflows
port one-to-one.
"""

from htool_python_tpu.models.geometry import (  # noqa: F401
    create_partitioned_geometries,
    create_random_geometries,
    create_random_points_in_disk,
    create_random_points_in_sphere,
)

# reference spelling (example/create_geometry.py:40)
create_partitionned_geometries = create_partitioned_geometries
