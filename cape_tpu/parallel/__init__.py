from cape_tpu.parallel.mesh import DataParallel, make_mesh
