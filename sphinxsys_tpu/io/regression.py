"""Dynamic-time-warping regression testing.

Counterpart of /root/reference/src/shared/regression_test/
(dynamic_time_warping_method.hpp — windowed DTW distance between observed
time series and a committed database of converged runs;
regression_test_base.h:52-135 — XML snapshot storage).

The XML formats are kept byte-compatible with the reference so its
committed databases under tests/*/regression_test_tool/ can be reused as
golden data for cross-framework validation (SURVEY.md §4 tier 2).
"""

from __future__ import annotations

import glob
import os
import re
import xml.etree.ElementTree as ET
from typing import Dict, List

import numpy as np


def dtw_distance(series_a: np.ndarray, series_b: np.ndarray,
                 window_size: int = 5) -> float:
    """Windowed DTW distance between two 1D series, exactly mirroring
    dynamic_time_warping_method.hpp:18-56 (|a-b| local norm, Sakoe-Chiba
    band of max(5, |len_a - len_b|))."""
    a = np.asarray(series_a, dtype=np.float64)
    b = np.asarray(series_b, dtype=np.float64)
    la, lb = len(a), len(b)
    d = np.full((la, lb), np.inf)
    d[0, 0] = abs(a[0] - b[0])
    for i in range(1, la):
        d[i, 0] = d[i - 1, 0] + abs(a[i] - b[0])
    for j in range(1, lb):
        d[0, j] = d[0, j - 1] + abs(a[0] - b[j])
    w = max(window_size, abs(la - lb))
    for i in range(1, la):
        for j in range(max(1, i - w), min(lb, i + w)):
            d[i, j] = abs(a[i] - b[j]) + min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return float(d[la - 1, lb - 1])


# ---------------------------------------------------------------------------
# Reference-compatible XML result files
# ---------------------------------------------------------------------------

def read_result_xml(path: str) -> np.ndarray:
    """Read a `*_Run_N_result.xml` file -> array (n_observations, n_snapshots)."""
    root = ET.parse(path).getroot()
    result_el = root.find("Result_Element")
    rows = []
    for particle in result_el:
        snaps = sorted(particle.attrib.items(),
                       key=lambda kv: int(kv[0].rsplit("_", 1)[1]))
        rows.append([float(v) for _, v in snaps])
    return np.asarray(rows)


def write_result_xml(path: str, data: np.ndarray) -> None:
    """Write observations (n_observations, n_snapshots) in the reference's
    result-XML layout."""
    data = np.atleast_2d(np.asarray(data))
    lines = ['<?xml version="1.0" encoding="UTF-8" ?>', "<result>",
             "    <Snapshot_Element>",
             f'        <Snapshot number_of_snapshot_for_local_result_="{data.shape[1]}" />',
             "    </Snapshot_Element>",
             "    <Result_Element>"]
    for k, row in enumerate(data):
        attrs = " ".join(f'snapshot_{i}="{float(v)!r}"' for i, v in enumerate(row))
        lines.append(f"        <Particle_{k} {attrs} />")
    lines += ["    </Result_Element>", "</result>", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def read_dtw_threshold_xml(path: str, quantity_name: str) -> np.ndarray:
    """Read `*_dtwdistance.xml` -> per-observation max allowed distance."""
    root = ET.parse(path).getroot()
    el = root[0]
    vals: Dict[int, float] = {}
    for name, v in el.attrib.items():
        m = re.match(rf"{re.escape(quantity_name)}_(\d+)$", name)
        if m:
            vals[int(m.group(1))] = float(v)
    return np.asarray([vals[k] for k in sorted(vals)])


class DTWRegressionTest:
    """testResult() semantics of the reference: the observed series must be
    within 1.01 * stored_threshold DTW distance of EVERY committed run
    (dynamic_time_warping_method.hpp:164-190)."""

    def __init__(self, db_dir: str, body_name: str, quantity_name: str):
        self.db_dir = db_dir
        self.body = body_name
        self.quantity = quantity_name
        prefix = os.path.join(db_dir, f"{body_name}_{quantity_name}")
        self.run_files = sorted(glob.glob(prefix + "_Run_*_result.xml"))
        self.threshold = read_dtw_threshold_xml(prefix + "_dtwdistance.xml",
                                                quantity_name)

    def distances(self, observed: np.ndarray) -> List[np.ndarray]:
        """Per stored run: per-observation DTW distance to `observed`
        ((n_observations, n_snapshots) or (n_snapshots,))."""
        observed = np.atleast_2d(np.asarray(observed))
        out = []
        for f in self.run_files:
            stored = read_result_xml(f)
            out.append(np.asarray([
                dtw_distance(stored[k], observed[k]) for k in range(stored.shape[0])]))
        return out

    def test(self, observed: np.ndarray, slack: float = 1.01):
        """Returns (passed, report string)."""
        dists = self.distances(observed)
        report, ok = [], True
        for f, d in zip(self.run_files, dists):
            fail = d > slack * self.threshold
            ok &= not fail.any()
            report.append(f"{os.path.basename(f)}: dtw={np.array2string(d, precision=4)} "
                          f"(limit {slack:.2f}*{self.threshold})"
                          + ("  FAIL" if fail.any() else ""))
        return ok, "\n".join(report)
