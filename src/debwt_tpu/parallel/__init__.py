from debwt_tpu.parallel.mesh import make_mesh
from debwt_tpu.parallel.dist import dist_build_bwt

__all__ = ["make_mesh", "dist_build_bwt"]
