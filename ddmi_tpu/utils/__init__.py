"""Host-side utilities (convocc/src/utils equivalents): mesh/pointcloud IO,
ICP alignment, matplotlib visualization.  Everything here is NumPy/CPU —
these are data-prep and inspection tools, not compute-path code."""

from ddmi_tpu.utils.icp import best_fit_transform, icp, nearest_neighbor
from ddmi_tpu.utils.mesh_io import (
    export_pointcloud,
    load_pointcloud,
    read_off,
    write_off,
)
from ddmi_tpu.utils.visualize import (
    visualize_data,
    visualize_pointcloud,
    visualize_voxels,
)

__all__ = [
    "best_fit_transform",
    "icp",
    "nearest_neighbor",
    "export_pointcloud",
    "load_pointcloud",
    "read_off",
    "write_off",
    "visualize_data",
    "visualize_pointcloud",
    "visualize_voxels",
]
