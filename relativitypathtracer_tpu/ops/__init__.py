from . import camera, intersect, mesh_intersect, relmath, texture_sample, tonemap  # noqa: F401
