"""Wavefront OBJ loader with the reference's exact indexing semantics.

Re-implements ReadOBJ (/root/reference/Render.cpp:436-538):
- supports `f v`, `f v/vt`, `f v/vt/vn` (first three refs of each face line);
- 1-based indices offset by the running pool sizes for multi-mesh imports;
- faces with no `vn` ref register their vertices for area-weighted smooth
  normal generation (sum of unnormalized face cross products per vertex,
  Render.cpp:508-533), appended to the pool in ascending vertex-index order;
- after parsing, an octree is generated for the new triangles.
"""

from __future__ import annotations

import numpy as np

from .mesh import HostMesh
from .octree import generate_octree


class ObjError(ValueError):
    pass


def read_obj(path: str, mesh: HostMesh) -> None:
    if not str(path).endswith(".obj"):
        raise ObjError(f"Not an .obj file: {path}")

    first_tri_index = len(mesh.triangles)
    first_vert = len(mesh.vertices)
    first_norm = len(mesh.normals)
    first_uv = len(mesh.uvs)
    vert_to_tris: dict[int, list[int]] = {}

    with open(path, "r") as f:
        for lineno, line in enumerate(f):
            parts = line.split()
            if not parts:
                continue
            prefix = parts[0]
            try:
                if prefix == "v":
                    mesh.vertices.append(
                        (float(parts[1]), float(parts[2]), float(parts[3]))
                    )
                elif prefix == "vt":
                    mesh.uvs.append((float(parts[1]), float(parts[2])))
                elif prefix == "vn":
                    n = np.array([float(parts[1]), float(parts[2]), float(parts[3])], np.float32)
                    n = n / np.linalg.norm(n)
                    mesh.normals.append(tuple(n))
                elif prefix == "f":
                    tri_index = len(mesh.triangles) // 9
                    for ref in parts[1:4]:
                        fields = ref.split("/")
                        vert_index = int(fields[0]) - 1 + first_vert
                        uv = fields[1] if len(fields) > 1 and fields[1] else "1"
                        if len(fields) > 2 and fields[2]:
                            norm = fields[2]
                        else:
                            norm = "1"
                            vert_to_tris.setdefault(vert_index, []).append(tri_index)
                        mesh.triangles.append(vert_index)
                        mesh.triangles.append(int(uv) - 1 + first_uv)
                        mesh.triangles.append(int(norm) - 1 + first_norm)
            except (ValueError, IndexError) as e:
                raise ObjError(
                    f'Error reading OBJ file "{path}": invalid syntax on line {lineno}'
                ) from e

    # Area-weighted smooth vertex normals for faces that lacked vn refs.
    # Iterate in ascending vertex index (the reference uses std::map ordering)
    # so generated normal indices match.
    for vert_index in sorted(vert_to_tris):
        tri_list = vert_to_tris[vert_index]
        N = np.zeros(3, np.float32)
        for tri in tri_list:
            ai = mesh.triangles[9 * tri + 0]
            bi = mesh.triangles[9 * tri + 3]
            ci = mesh.triangles[9 * tri + 6]
            A = np.asarray(mesh.vertices[ai], np.float32)
            B = np.asarray(mesh.vertices[bi], np.float32)
            C = np.asarray(mesh.vertices[ci], np.float32)
            # Unnormalized cross: contribution proportional to face area.
            N += np.cross(B - A, C - A)
            if ai == vert_index:
                mesh.triangles[2 + 9 * tri + 0] = len(mesh.normals)
            elif bi == vert_index:
                mesh.triangles[2 + 9 * tri + 3] = len(mesh.normals)
            elif ci == vert_index:
                mesh.triangles[2 + 9 * tri + 6] = len(mesh.normals)
        mesh.normals.append(tuple(N / np.linalg.norm(N)))

    root = generate_octree(mesh, first_tri_index)
    mesh.mesh_indices.append(root)
    mesh.root_tri_ranges[root] = (0, len(mesh.triangles) // 9)
