from .mesh import Mesh, load_mesh, is_pointcloud_file
from .mesh_io import read_mesh_file, write_obj, write_ply
from .laplacian import cotan_laplacian, voronoi_mass_matrix, barycentric_mass_matrix, build_laplacian
from . import cameras
