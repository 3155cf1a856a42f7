"""Wavefront OBJ parser (pure Python/numpy, host-side).

Covers the subset the reference consumes from its vendored tinyobj
(reference: src/model.c:91-132, include/tinyobj_loader_c.h:1208): `v`, `vn`,
`vt` records and `f` faces with v / v/vt / v//vn / v/vt/vn forms, fan-
triangulation of n-gons (TINYOBJ_FLAG_TRIANGULATE), negative (relative)
indices, and `o`/`g`/`s`/`usemtl`/`mtllib` records skipped gracefully.

Output is already SoA numpy — the layout the device wants — rather than an
AoS attrib struct: verts [V,3] f32, normals [VN,3] f32, and per-corner index
triples faces [F,3,3] i32 with columns (v_idx, vn_idx, vt_idx); -1 marks an
absent index (the reference uses the same sentinel, src/kernel.cl:349).
"""

from __future__ import annotations

import numpy as np


class ObjParseError(ValueError):
    pass


def _resolve(idx: int, count: int) -> int:
    """OBJ indices are 1-based; negative indices count from the end."""
    if idx > 0:
        return idx - 1
    if idx < 0:
        return count + idx
    raise ObjParseError("OBJ index 0 is invalid")


def _parse_corner(token: str, nv: int, nvt: int, nvn: int):
    """Parse one face corner `v[/vt][/vn]` → (v, vn, vt) with -1 sentinels."""
    parts = token.split("/")
    v = _resolve(int(parts[0]), nv)
    vt = -1
    vn = -1
    if len(parts) >= 2 and parts[1]:
        vt = _resolve(int(parts[1]), nvt)
    if len(parts) >= 3 and parts[2]:
        vn = _resolve(int(parts[2]), nvn)
    return v, vn, vt


def parse_obj(text: str):
    """Parse OBJ text → dict of numpy arrays.

    Returns {"verts": [V,3] f32, "normals": [VN,3] f32, "texcoords": [VT,2]
    f32, "faces": [F,3,3] i32 (corner-major: faces[f,c] = (v, vn, vt))}.
    """
    verts: list = []
    normals: list = []
    texcoords: list = []
    corners: list = []  # flat list of (v, vn, vt)

    for raw_line in text.splitlines():
        line = raw_line.strip()
        if not line or line.startswith("#"):
            continue
        # line continuation
        while line.endswith("\\"):
            line = line[:-1]
        tokens = line.split()
        tag = tokens[0]
        if tag == "v":
            if len(tokens) < 4:
                raise ObjParseError(f"short vertex record: {raw_line!r}")
            verts.append([float(tokens[1]), float(tokens[2]), float(tokens[3])])
        elif tag == "vn":
            if len(tokens) < 4:
                raise ObjParseError(f"short normal record: {raw_line!r}")
            normals.append([float(tokens[1]), float(tokens[2]), float(tokens[3])])
        elif tag == "vt":
            if len(tokens) < 3:
                raise ObjParseError(f"short texcoord record: {raw_line!r}")
            texcoords.append([float(tokens[1]), float(tokens[2])])
        elif tag == "f":
            face = [
                _parse_corner(t, len(verts), len(texcoords), len(normals))
                for t in tokens[1:]
            ]
            if len(face) < 3:
                raise ObjParseError(f"face with <3 corners: {raw_line!r}")
            # fan triangulation, as tinyobj's TINYOBJ_FLAG_TRIANGULATE does
            for k in range(1, len(face) - 1):
                corners.extend([face[0], face[k], face[k + 1]])
        else:
            # o / g / s / usemtl / mtllib / l / p — ignored, like the
            # reference ignores everything but geometry.
            continue

    v = np.asarray(verts, np.float32).reshape(-1, 3)
    vn = np.asarray(normals, np.float32).reshape(-1, 3)
    vt = np.asarray(texcoords, np.float32).reshape(-1, 2)
    f = np.asarray(corners, np.int32).reshape(-1, 3, 3)

    if f.size and (np.any(f[..., 0] < 0) or np.any(f[..., 0] >= len(v))):
        raise ObjParseError("face references out-of-range vertex index")
    if f.size and np.any(f[..., 1] >= len(vn)):
        raise ObjParseError("face references out-of-range normal index")
    return {"verts": v, "normals": vn, "texcoords": vt, "faces": f}


def load_obj(path: str):
    """Read and parse an OBJ file (reference entry: src/model.c:74-145)."""
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        return parse_obj(fh.read())
