"""Mesh-graph precompute layer (host-side, offline).

Everything here runs in numpy/scipy on the host, once, before any TPU work:
topology extraction, graph Laplacians, QSlim decimation, barycentric
upsample-matrix construction, and the mesh-resolution pyramid that the
graph-conv model consumes. Runtime (on-device) representations of these
matrices live in `cape_tpu.ops.sparse`.
"""

from cape_tpu.meshops.obj_io import load_obj, save_obj
from cape_tpu.meshops.topology import vert_connectivity, vertices_per_edge
from cape_tpu.meshops.laplacian import normalized_laplacian, rescale_laplacian
from cape_tpu.meshops.pyramid import MeshPyramid, build_pyramid
from cape_tpu.meshops import assets
