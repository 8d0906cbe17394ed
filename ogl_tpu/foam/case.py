"""OpenFOAM case interop: fvSolution files and exported-system replay.

The reference exports each rank's system at write times as
`processor<i>/<time>/<field>_A_{local,non_local}.mtx` plus `<field>_b.mtx`
(CsrMatrixWrapper.H:271-290, common.C:31-58) and validates the artifacts
(test/data_validation.py) but never reads them back.  This module closes
the loop: parse a real `system/fvSolution` file for the solver controls,
ingest an exported case into per-rank `LduMatrix` systems, and replay the
solve — so an exported transient step can be reproduced (and validated)
outside OpenFOAM.

The non-local halo columns in the export are recv-buffer SLOTS (natural
processor-interface face enumeration, HostMatrix.C:412-436); they only
resolve to neighbour cells through the communication pattern, which the
reference does NOT serialise.  Our exporter therefore adds a minimal
sidecar `<field>_comm.json` per rank — `[{"neighbor": r, "n_faces": k},
...]` in interface order — from which interface membership, face cells
(the non-local entry rows), and coefficients (the negated entry values,
HostMatrix.C:204) are all reconstructible.
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np

from ogl_tpu.core import ldu as ldu_mod
from ogl_tpu.core import mtx
from ogl_tpu.foam import dictionary

__all__ = ["load_fv_solution", "read_exported_case", "read_cell_addressing",
           "solve_exported_case"]


def load_fv_solution(path: str, field: str) -> dict:
    """Solver controls for `field` from a real fvSolution file (regex keys,
    last-match-wins — dictionary.solver_controls semantics)."""
    with open(path) as f:
        d = dictionary.parse(f.read())
    return dictionary.solver_controls(d, field)


def _processor_dirs(case_dir: str) -> list[str]:
    procs = []
    for p in glob.glob(os.path.join(case_dir, "processor*")):
        m = re.fullmatch(r"processor(\d+)", os.path.basename(p))
        if m:
            procs.append((int(m.group(1)), p))
    procs.sort()
    if not procs:
        raise FileNotFoundError(f"no processor*/ directories under {case_dir}")
    if [i for i, _ in procs] != list(range(len(procs))):
        raise ValueError(f"non-contiguous processor directories: {procs}")
    return [p for _, p in procs]


def read_exported_case(case_dir: str, field: str, time: str):
    """Ingest an exported system: returns (ranks, b) where ranks is a list
    of per-rank LduMatrix (with ProcInterfaces for multi-rank cases) and b
    the concatenated global RHS."""
    ranks, bs = [], []
    for pdir in _processor_dirs(case_dir):
        pre = os.path.join(pdir, time, field)
        local = mtx.read(f"{pre}_A_local.mtx")
        b_i = np.asarray(mtx.read(f"{pre}_b.mtx")).reshape(-1)
        bs.append(b_i)

        ifaces = []
        nl_path = f"{pre}_A_non_local.mtx"
        comm_path = f"{pre}_comm.json"
        if os.path.exists(nl_path) and os.path.exists(comm_path):
            nl = mtx.read(nl_path)
            with open(comm_path) as f:
                comm = json.load(f)
            nrows = np.asarray(nl.rows)
            slots = np.asarray(nl.cols)
            nvals = np.asarray(nl.vals)
            total = sum(int(c["n_faces"]) for c in comm)
            if len(slots) != total or (len(slots)
                                       and set(slots.tolist()) != set(range(total))):
                raise ValueError(
                    f"{nl_path}: {len(slots)} non-local entries do not "
                    f"cover the {total} interface faces of {comm_path}")
            # slot s IS the natural face index: invert to face order
            cell_of = np.zeros(total, np.int64)
            coeff_of = np.zeros(total)
            cell_of[slots] = nrows
            coeff_of[slots] = -nvals  # un-negate (HostMatrix.C:204)
            off = 0
            for c in comm:
                k = int(c["n_faces"])
                ifaces.append(ldu_mod.ProcInterface(
                    neighbor=int(c["neighbor"]),
                    face_cells=cell_of[off:off + k],
                    coeffs=coeff_of[off:off + k]))
                off += k
        ranks.append(ldu_mod.ldu_from_coo(local, proc_interfaces=tuple(ifaces)))
    return ranks, np.concatenate(bs)


def read_cell_addressing(case_dir: str, field: str, time: str):
    """Local→original-global cell map of a graph-decomposed export
    (concatenated per-rank `<field>_cellProcAddressing.mtx`, the
    decomposePar analogue written by DistFoamSolver._export), or None when
    the export used the identity ("simple") numbering.  A replayed
    solution x maps back to the exporter's field order via
    `x_orig[addr] = x`."""
    parts = []
    for pdir in _processor_dirs(case_dir):
        p = os.path.join(pdir, time, f"{field}_cellProcAddressing.mtx")
        if not os.path.exists(p):
            return None
        parts.append(np.asarray(mtx.read(p)).reshape(-1).astype(np.int64))
    return np.concatenate(parts)


def solve_exported_case(case_dir: str, field: str, time: str,
                        controls=None, fv_solution: str | None = None,
                        mesh=None):
    """Replay an exported step: ingest + solve, returning (x, perf).

    controls: a controls dict, or None to read them from `fv_solution`
    (defaults to <case_dir>/system/fvSolution)."""
    from ogl_tpu import foam

    if controls is None:
        fv = fv_solution or os.path.join(case_dir, "system", "fvSolution")
        controls = load_fv_solution(fv, field)
    ranks, b = read_exported_case(case_dir, field, time)
    name = f"{field}_replay"
    if len(ranks) == 1:
        return foam.solve(name, ranks[0], b, controls)
    if mesh is None:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:len(ranks)]), ("x",))
    return foam.solve_distributed(name, ranks, b, controls, mesh=mesh)
