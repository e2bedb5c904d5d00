"""VTP (VTK PolyData XML) body-state writer.

Counterpart of /root/reference/src/shared/io_system/io_vtk.h:62-136
(BodyStatesRecordingToVtp, hand-rolled XML) — particle clouds as VTP point
sets with selected point-data arrays, viewable in ParaView.  Pure host-side
NumPy/text, written once per output interval.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np

try:  # native text-serialization hot path (native/fastio.cpp; build with
    # `python native/build.py`) — ~3x faster than the Python formatter
    import _sphinxsys_fastio as _fastio
except ImportError:  # pragma: no cover - environment without the .so
    _fastio = None


def _format_rows(arr: np.ndarray) -> str:
    """ASCII rows of a 2D float array ('%.7g', space-separated)."""
    arr = np.ascontiguousarray(arr)
    if _fastio is not None and arr.dtype in (np.float32, np.float64):
        return _fastio.format_rows(arr, int(arr.dtype == np.float64)).decode()
    return "\n".join(" ".join(f"{x:.7g}" for x in row) for row in arr) + "\n"


def _as3d(pos: np.ndarray) -> np.ndarray:
    if pos.shape[1] == 3:
        return pos
    out = np.zeros((pos.shape[0], 3), dtype=pos.dtype)
    out[:, : pos.shape[1]] = pos
    return out


def write_vtp(path: str, state: dict, variables: Iterable[str] = ()) -> None:
    """Write the real particles of `state` with the named variables as
    point data (scalars or vectors; vectors padded to 3 components)."""
    n = int(state["NReal"])
    pos = _as3d(np.asarray(state["Position"])[:n])
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="PolyData" version="1.0" byte_order="LittleEndian">',
        "  <PolyData>",
        f'    <Piece NumberOfPoints="{n}" NumberOfVerts="0" NumberOfLines="0" '
        'NumberOfStrips="0" NumberOfPolys="0">',
        "      <Points>",
        '        <DataArray type="Float32" NumberOfComponents="3" format="ascii">',
        _format_rows(pos).rstrip("\n"),
        "        </DataArray>",
        "      </Points>",
        "      <PointData>",
    ]
    for name in variables:
        arr = np.asarray(state[name])[:n]
        if arr.ndim == 1:
            lines.append(f'        <DataArray type="Float32" Name="{name}" format="ascii">')
            lines.append(_format_rows(arr[:, None]).replace("\n", " ").rstrip())
        else:
            arr3 = _as3d(arr)
            lines.append(f'        <DataArray type="Float32" Name="{name}" '
                         'NumberOfComponents="3" format="ascii">')
            lines.append(_format_rows(arr3).rstrip("\n"))
        lines.append("        </DataArray>")
    lines += [
        "      </PointData>",
        "    </Piece>",
        "  </PolyData>",
        "</VTKFile>",
        "",
    ]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))


class BodyStatesRecording:
    """Numbered VTP series per body (BodyStatesRecordingToVtp)."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.counter = 0
        self._selections: dict[str, list[str]] = {}

    def add_to_write(self, body_name: str, *variables: str) -> None:
        self._selections.setdefault(body_name, []).extend(variables)

    def write(self, bodies: dict[str, dict]) -> None:
        for name, state in bodies.items():
            variables = self._selections.get(name, [])
            path = os.path.join(self.output_dir, f"{name}_{self.counter:07d}.vtp")
            write_vtp(path, state, variables)
        self.counter += 1
