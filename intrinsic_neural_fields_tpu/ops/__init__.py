from .ray_gen import pixel_grid_coords, ray_origins_and_directions
from .intersect import (
    Hits,
    HostBVH,
    intersect_rays,
    intersect_rays_host,
    intersect_rays_numpy,
)
from .interpolate import interpolate_vertex_features, hit_points_xyz
from .raster import intersect_coords_pinhole, intersect_coords_pinhole_core
