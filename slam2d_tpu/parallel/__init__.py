from slam2d_tpu.parallel.mesh import make_particle_mesh  # noqa: F401
