"""Binary PLY loader for INRIA 3DGS ``point_cloud.ply`` files.

Vectorized NumPy re-implementation of the reference's per-point parse loop
(/root/reference/src/io/ply.rs:50-100): positions f32, normals skipped, SH DC
then channel-first rest coefficients transposed to coefficient-major, opacity
through a stable sigmoid, scales through exp, quaternion normalized, and the
3D covariance precomputed on the host and stored as f16 — the reference
stores f16 on the wire (/root/reference/src/pointcloud.rs:38-45) and this
loader reproduces that quantization exactly.

Metadata is parsed from PLY comments (``mip=...``, ``kernel_size=...``,
``background_color=r,g,b``; /root/reference/src/io/ply.rs:123-161).
"""

from __future__ import annotations

import io as _io
from typing import BinaryIO, Dict, List, Optional, Tuple

import numpy as np

from websplat_tpu.utils.gmath import build_cov, sh_deg_from_num_coefs, sigmoid

_PLY_TYPES = {
    "float": "f4",
    "float32": "f4",
    "double": "f8",
    "float64": "f8",
    "uchar": "u1",
    "uint8": "u1",
    "char": "i1",
    "int8": "i1",
    "ushort": "u2",
    "uint16": "u2",
    "short": "i2",
    "int16": "i2",
    "uint": "u4",
    "uint32": "u4",
    "int": "i4",
    "int32": "i4",
}

MAGIC = b"ply"


class PlyHeader:
    def __init__(self) -> None:
        self.encoding: str = ""
        self.comments: List[str] = []
        self.elements: List[Tuple[str, int, List[Tuple[str, str]]]] = []

    @property
    def vertex(self) -> Tuple[int, List[Tuple[str, str]]]:
        for name, count, props in self.elements:
            if name == "vertex":
                return count, props
        raise ValueError("missing element vertex")


def parse_header(f: BinaryIO) -> PlyHeader:
    h = PlyHeader()
    line = f.readline().strip()
    if line != b"ply":
        raise ValueError("not a ply file")
    props: List[Tuple[str, str]] = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in ply header")
        parts = line.decode("ascii", errors="replace").strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            h.encoding = parts[1]
        elif parts[0] == "comment":
            h.comments.append(" ".join(parts[1:]))
        elif parts[0] == "element":
            props = []
            h.elements.append((parts[1], int(parts[2]), props))
        elif parts[0] == "property":
            if parts[1] == "list":
                raise ValueError("list properties not supported")
            props.append((parts[2], parts[1]))
        elif parts[0] == "end_header":
            return h


def _try_native_decode(raw, props, num_points, num_sh_coefs, byte_order):
    """Route the standard INRIA all-f32 layout through the multithreaded C++
    decoder (websplat_tpu/native); returns None when the layout is unusual
    or the native library is unavailable."""
    if any(t not in ("float", "float32") for _, t in props):
        return None
    names = [name for name, _ in props]
    try:
        off = {k: names.index(k) for k in ("x", "f_dc_0", "opacity", "scale_0", "rot_0")}
    except ValueError:
        return None
    rest = num_sh_coefs - 1
    if rest > 0:
        if "f_rest_0" not in names:
            return None
        off_rest = names.index("f_rest_0")
    else:
        off_rest = off["f_dc_0"] + 3  # unused
    from websplat_tpu import native

    return native.decode_ply_native(
        raw,
        stride_f32=len(names),
        off_pos=off["x"],
        off_dc=off["f_dc_0"],
        off_rest=off_rest,
        off_opacity=off["opacity"],
        off_scale=off["scale_0"],
        off_rot=off["rot_0"],
        n_coefs=num_sh_coefs,
        big_endian=(byte_order == ">"),
        n_points=num_points,
    )


def _comment_value(comments: List[str], key: str) -> Optional[str]:
    # Reference matches by substring containment and splits on the last '='
    # (/root/reference/src/io/ply.rs:123-138).
    for c in comments:
        if key in c:
            return c.split("=")[-1]
    return None


def read_ply(f: BinaryIO) -> Dict:
    header = parse_header(f)
    num_points, props = header.vertex
    if header.encoding == "ascii":
        # The reference todo!()s ASCII (/root/reference/src/io/ply.rs:169);
        # supported here as a superset: whitespace-separated rows in header
        # property order, then the exact same math as the binary path.
        body = np.loadtxt(f, dtype=np.float32, max_rows=num_points, ndmin=2)
        if body.shape != (num_points, len(props)):
            raise ValueError(
                f"ascii ply body shape {body.shape} != "
                f"({num_points}, {len(props)})"
            )
        data = {name: body[:, i] for i, (name, _) in enumerate(props)}
        raw = None
        byte_order = "<"
    else:
        byte_order = "<" if header.encoding == "binary_little_endian" else ">"
        dtype = np.dtype([(name, byte_order + _PLY_TYPES[t]) for name, t in props])
        raw = f.read(dtype.itemsize * num_points)
        if len(raw) < dtype.itemsize * num_points:
            raise ValueError("ply file truncated")
        data = np.frombuffer(raw, dtype=dtype, count=num_points)

    num_sh_coefs = sum(1 for name, _ in props if name.startswith("f_")) // 3
    sh_deg = sh_deg_from_num_coefs(num_sh_coefs)
    if sh_deg is None:
        raise ValueError(f"invalid number of sh coefficients: {num_sh_coefs * 3}")

    native = (
        _try_native_decode(raw, props, num_points, num_sh_coefs, byte_order)
        if raw is not None
        else None
    )
    if native is not None:
        xyz, opacity16, cov16, sh16 = native
        mip = _comment_value(header.comments, "mip")
        kernel = _comment_value(header.comments, "kernel_size")
        bg = _comment_value(header.comments, "background_color")
        return dict(
            xyz=xyz,
            opacity=opacity16,
            cov=cov16,
            sh=sh16,
            sh_deg=int(sh_deg),
            num_points=int(num_points),
            mip_splatting=(mip.strip().lower() == "true") if mip is not None else None,
            kernel_size=float(kernel) if kernel is not None else None,
            background_color=(
                tuple(float(v) for v in bg.split(",")[:3]) if bg is not None else None
            ),
            compressed=False,
        )

    xyz = np.stack([data["x"], data["y"], data["z"]], axis=1).astype(np.float32)

    # SH: DC (f_dc_*) then rest channel-first [N, 3, C-1] -> coef-major
    # [N, C, 3] (/root/reference/src/io/ply.rs:63-75).
    sh = np.zeros((num_points, 16, 3), dtype=np.float32)
    for j in range(3):
        sh[:, 0, j] = data[f"f_dc_{j}"]
    n_rest = num_sh_coefs - 1
    for i in range(n_rest):
        for j in range(3):
            sh[:, i + 1, j] = data[f"f_rest_{j * n_rest + i}"]

    opacity = sigmoid(np.asarray(data["opacity"], dtype=np.float32))
    scale = np.exp(
        np.stack([data["scale_0"], data["scale_1"], data["scale_2"]], axis=1).astype(np.float32)
    )
    rot = np.stack([data[f"rot_{i}"] for i in range(4)], axis=1).astype(np.float32)
    rot = rot / np.linalg.norm(rot, axis=1, keepdims=True)
    cov = build_cov(rot, scale)

    mip = _comment_value(header.comments, "mip")
    kernel = _comment_value(header.comments, "kernel_size")
    bg = _comment_value(header.comments, "background_color")

    return dict(
        xyz=xyz,
        opacity=opacity.astype(np.float16),
        cov=cov.astype(np.float16),
        sh=sh.astype(np.float16),
        sh_deg=int(sh_deg),
        num_points=int(num_points),
        mip_splatting=(mip.strip().lower() == "true") if mip is not None else None,
        kernel_size=float(kernel) if kernel is not None else None,
        background_color=(
            tuple(float(v) for v in bg.split(",")[:3]) if bg is not None else None
        ),
        compressed=False,
    )


def write_ply(path_or_file, xyz, sh, opacity_raw, scale_raw, rot, comments=()) -> None:
    """Write an INRIA-layout binary-LE PLY (testing / interchange utility).

    ``opacity_raw``/``scale_raw`` are pre-activation (logit / log) values as
    stored in real 3DGS checkpoints.
    """
    xyz = np.asarray(xyz, np.float32)
    sh = np.asarray(sh, np.float32)
    n, c = sh.shape[0], sh.shape[1]
    fields = ["x", "y", "z", "nx", "ny", "nz"]
    fields += [f"f_dc_{j}" for j in range(3)]
    fields += [f"f_rest_{k}" for k in range(3 * (c - 1))]
    fields += ["opacity"] + [f"scale_{i}" for i in range(3)] + [f"rot_{i}" for i in range(4)]
    header = ["ply", "format binary_little_endian 1.0"]
    header += [f"comment {c}" for c in comments]
    header += [f"element vertex {n}"]
    header += [f"property float {f}" for f in fields]
    header += ["end_header", ""]

    rest = np.transpose(sh[:, 1:, :], (0, 2, 1)).reshape(n, -1)  # channel-first
    rows = np.concatenate(
        [
            xyz,
            np.zeros((n, 3), np.float32),
            sh[:, 0, :],
            rest,
            np.asarray(opacity_raw, np.float32).reshape(n, 1),
            np.asarray(scale_raw, np.float32).reshape(n, 3),
            np.asarray(rot, np.float32).reshape(n, 4),
        ],
        axis=1,
    ).astype("<f4")

    own = isinstance(path_or_file, (str, bytes))
    f = open(path_or_file, "wb") if own else path_or_file
    try:
        f.write("\n".join(header).encode("ascii"))
        f.write(rows.tobytes())
    finally:
        if own:
            f.close()


def dumps_ply(xyz, sh, opacity_raw, scale_raw, rot, comments=()) -> bytes:
    buf = _io.BytesIO()
    write_ply(buf, xyz, sh, opacity_raw, scale_raw, rot, comments)
    return buf.getvalue()
