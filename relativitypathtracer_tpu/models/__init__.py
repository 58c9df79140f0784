from . import dsl, mesh, obj_loader, octree, scene, texture  # noqa: F401
