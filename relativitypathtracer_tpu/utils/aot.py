"""Ahead-of-time export of the frame renderer as a portable artifact.

`jax.export` serializes the traced-and-lowered frame step (StableHLO +
calling convention) so a serving host can run frames WITHOUT the Python
scene pipeline: deserialize, then call with (scene pytree, FrameState).
The scene stays an ARGUMENT, so one artifact serves any scene whose build
produces the same array shapes (same object counts / texture atlas / mesh
pools) -- shape-polymorphic serving of scene edits, camera motion and
boosts with zero retracing.

The reference has no analog (it JIT-compiles OpenCL at every startup,
/root/reference/CLSetup.cpp); this is the TPU-deployment story: export once
on any host (cross-platform lowering needs no chip), ship the artifact to
the fleet, `load_render` and go.
"""

from __future__ import annotations

import jax
from jax import export as jax_export

from ..models.scene import (
    MeshArrays, MeshBatchStatic, MeshStatic, ObjectsSoA, Scene)
from ..render import FrameState, build_render_fn

# The artifact's calling convention includes the argument PyTreeDefs;
# every NamedTuple node in (Scene, FrameState) must be registered for
# serialization. Serialized names are a compatibility contract: keep them
# stable even if the classes move modules.
for _t in (ObjectsSoA, MeshArrays, MeshStatic, MeshBatchStatic, Scene,
           FrameState):
    try:
        jax_export.register_namedtuple_serialization(
            _t, serialized_name=f"rpt.{_t.__name__}")
    except ValueError:  # already registered (re-import, tests)
        pass


def _arg_structs(scene):
    """ShapeDtypeStructs for (scene, state) matching a built Scene pytree."""
    scene_s = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), scene)
    state_s = FrameState(
        cam_velocity=jax.ShapeDtypeStruct((3,), "float32"),
        cam_pos=jax.ShapeDtypeStruct((4,), "float32"))
    return scene_s, state_s


def _finish(exp, lint: bool) -> bytes:
    if lint and "tpu" in exp.platforms:
        from .mosaic_lint import assert_vmem_budget

        assert_vmem_budget(exp.mlir_module())
    return bytes(exp.serialize())


def export_render(scene, meta, width: int, height: int,
                  interval: int | None = None, msaa: int = 1,
                  platforms: tuple[str, ...] = ("tpu",),
                  lint: bool = True) -> bytes:
    """Serialize the jitted frame renderer for the given platforms.

    `scene` supplies only the input SHAPES (it is not baked in). Platforms
    are lowered eagerly on this host -- no device of that kind is needed
    ("tpu" exports fine from a CPU box; the production Pallas kernels
    require it, the jnp fallback also lowers for "cpu"). TPU exports are
    VMEM-budget-linted by default (utils/mosaic_lint.py): an artifact that
    cannot fit the chip fails HERE, not on the serving fleet."""
    if interval is None:
        interval = meta.default_interval
    fn = build_render_fn(meta, width, height, int(interval), msaa)
    scene_s, state_s = _arg_structs(scene)
    exp = jax_export.export(jax.jit(fn), platforms=platforms)(scene_s, state_s)
    return _finish(exp, lint)


def export_sharded_render(scene, meta, width: int, height: int, mesh,
                          interval: int | None = None, msaa: int = 1,
                          platforms: tuple[str, ...] = ("tpu",),
                          lint: bool = True) -> bytes:
    """Serialize the MULTI-CHIP renderer (parallel/tiles.py shard_map over
    `mesh`). The artifact records the device count; the serving host calls
    it with arguments device_put onto an equal-size mesh (replicated
    PartitionSpec() -- the scene is replicated, the image decomposition is
    internal)."""
    from ..parallel.tiles import build_sharded_render_fn

    if interval is None:
        interval = meta.default_interval
    fn = build_sharded_render_fn(meta, width, height, int(interval), mesh,
                                 msaa=msaa)
    scene_s, state_s = _arg_structs(scene)
    exp = jax_export.export(jax.jit(fn), platforms=platforms)(scene_s, state_s)
    return _finish(exp, lint)


def load_render(data: bytes):
    """Deserialize an exported renderer; returns render(scene, state) ->
    (H, W, 3) image, executable on any platform the artifact was exported
    for (device dispatch is the caller's jax context; multi-chip artifacts
    need args device_put onto a mesh of the exported size)."""
    exp = jax_export.deserialize(data)
    return exp.call
