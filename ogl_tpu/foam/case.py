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

A TRUE reference export has no such sidecar.  For those,
`reconstruct_comm` recovers the mapping from the artifacts alone using
the pairwise interface contract (matching interfaces enumerate their
shared faces in the same order, with equal coupling coefficients —
HostMatrix.C:252-306): per rank, the slot-ordered coefficient sequence
is the concatenation of per-neighbour runs in ascending-neighbour patch
order, so a two-pointer sweep over rank pairs that matches maximal
common coefficient prefixes determines every (neighbour, n_faces) run.
This is exact for generic (real-valued) coefficients; it is provably
UNDER-DETERMINED for degenerate cases — e.g. a uniform-coefficient mesh
decomposed so several run-length covers satisfy the pairwise totals
(4 ranks, all totals 2: a 4-cycle of single-face interfaces and two
disjoint 2-face pairings serialise identically).  Reconstruction
validates itself (full cover + global structural symmetry) and raises
with the minimal extra input (the sidecar) when the artifacts are
genuinely ambiguous.
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
           "reconstruct_comm", "solve_exported_case"]


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


def _slot_order(nl, nl_path: str):
    """Invert a non-local export to face order: slot s IS the natural face
    index (HostMatrix.C:412-436).  Returns (cell_of, coeff_of) with the
    negation undone (HostMatrix.C:204)."""
    nrows = np.asarray(nl.rows)
    slots = np.asarray(nl.cols)
    nvals = np.asarray(nl.vals)
    total = len(slots)
    if total and set(slots.tolist()) != set(range(total)):
        raise ValueError(
            f"{nl_path}: non-local columns are not a contiguous slot "
            f"enumeration 0..{total - 1}")
    cell_of = np.zeros(total, np.int64)
    coeff_of = np.zeros(total)
    cell_of[slots] = nrows
    coeff_of[slots] = -nvals
    return cell_of, coeff_of


def reconstruct_comm(coeff_seqs: list[np.ndarray],
                     allow_degenerate: bool = False) -> list[list[dict]]:
    """Recover each rank's `[{"neighbor": j, "n_faces": k}, ...]` from the
    slot-ordered interface coefficient sequences alone — the sidecar-free
    ingest of a true reference export (CsrMatrixWrapper.H:271-290 writes no
    communication pattern).

    Uses the pairwise interface contract: interface (i, j) stores the same
    shared faces, in the same order, with equal coefficients on both ranks
    (HostMatrix.C:252-306), and each rank's slots concatenate its
    interfaces in ascending-neighbour patch order (decomposePar processor
    patch ordering).  A two-pointer sweep over rank pairs in lexicographic
    order therefore sees, at the time pair (i, j) is tested, both cursors
    parked exactly where an (i, j) interface would start; the maximal
    common coefficient prefix is its face count.

    Exact for generic real coefficients.  For degenerate (repeated-value)
    runs the run boundary is not always identifiable — see the module
    docstring's 4-cycle counterexample, where two mutually inconsistent
    pairings both pass the final cover + symmetry validation (a
    uniform-coefficient orthogonal mesh is a COMMON export, and a wrong
    pairing silently builds a wrong distributed matrix).  A matched run
    containing repeated coefficient values therefore raises ValueError
    naming the `_comm.json` sidecar as the fix; pass
    `allow_degenerate=True` to downgrade that to a RuntimeWarning when the
    decomposition is known to be a strip/chain (uniquely covered even with
    uniform values).  An incomplete cover always raises."""
    import warnings

    n_ranks = len(coeff_seqs)
    cur = [0] * n_ranks
    comm: list[list[dict]] = [[] for _ in range(n_ranks)]
    for i in range(n_ranks):
        for j in range(i + 1, n_ranks):
            a, b = coeff_seqs[i], coeff_seqs[j]
            ci, cj = cur[i], cur[j]
            k = 0
            while (ci + k < len(a) and cj + k < len(b)
                   and a[ci + k] == b[cj + k]):
                k += 1
            if k == 0:
                continue
            run = a[ci:ci + k]
            if len(np.unique(run)) < k:
                msg = (
                    f"reconstruct_comm: interface ({i},{j}) has repeated "
                    "coefficient values — the run boundary is inferred, not "
                    "certain, and the final cover/symmetry validation CANNOT "
                    "detect a mis-pairing (a 4-rank uniform ring reconstructs "
                    "as two 2-face pairings that validate).  Export with the "
                    "`<field>_comm.json` sidecar (ogl_tpu's exporter writes "
                    "it), or pass allow_degenerate=True if the decomposition "
                    "is a strip/chain where the cover is unique.")
                if not allow_degenerate:
                    raise ValueError(msg)
                warnings.warn(msg, RuntimeWarning, stacklevel=2)
            comm[i].append({"neighbor": j, "n_faces": k})
            comm[j].append({"neighbor": i, "n_faces": k})
            cur[i] += k
            cur[j] += k
    bad = [i for i in range(n_ranks) if cur[i] != len(coeff_seqs[i])]
    if bad:
        raise ValueError(
            f"reconstruct_comm: ranks {bad} have interface slots no "
            "pairwise coefficient match covers — the artifacts are "
            "ambiguous or inconsistent.  The minimal extra input is the "
            "per-rank `<field>_comm.json` sidecar "
            '([{"neighbor": r, "n_faces": k}, ...] in patch order) that '
            "ogl_tpu's own exporter writes.")
    return comm


def read_exported_case(case_dir: str, field: str, time: str,
                       allow_degenerate: bool = False):
    """Ingest an exported system: returns (ranks, b) where ranks is a list
    of per-rank LduMatrix (with ProcInterfaces for multi-rank cases) and b
    the concatenated global RHS.  Works on true reference exports (no
    `_comm.json` sidecar): the communication pattern is then reconstructed
    from the pairwise interface contract (see `reconstruct_comm`;
    `allow_degenerate` is forwarded — repeated-coefficient runs otherwise
    raise, since a mis-pairing cannot be detected downstream)."""
    locals_, bs, nl_data = [], [], []
    for pdir in _processor_dirs(case_dir):
        pre = os.path.join(pdir, time, field)
        locals_.append(mtx.read(f"{pre}_A_local.mtx"))
        bs.append(np.asarray(mtx.read(f"{pre}_b.mtx")).reshape(-1))
        nl_path = f"{pre}_A_non_local.mtx"
        comm = None
        cells = coeffs = None
        if os.path.exists(nl_path):
            cells, coeffs = _slot_order(mtx.read(nl_path), nl_path)
            comm_path = f"{pre}_comm.json"
            if os.path.exists(comm_path):
                with open(comm_path) as f:
                    comm = json.load(f)
                total = sum(int(c["n_faces"]) for c in comm)
                if len(cells) != total:
                    raise ValueError(
                        f"{nl_path}: {len(cells)} non-local entries do not "
                        f"cover the {total} interface faces of {comm_path}")
        nl_data.append((cells, coeffs, comm))

    if any(c is not None and cm is None for c, _, cm in nl_data):
        # sidecar-free reference export: reconstruct the pattern
        recon = reconstruct_comm(
            [cf if cf is not None else np.zeros(0) for _, cf, _ in nl_data],
            allow_degenerate=allow_degenerate)
        nl_data = [(c, cf, cm if cm is not None else recon[i])
                   for i, (c, cf, cm) in enumerate(nl_data)]

    ranks = []
    for local, (cell_of, coeff_of, comm) in zip(locals_, nl_data):
        ifaces = []
        if comm:
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
                        mesh=None, allow_degenerate: bool = False):
    """Replay an exported step: ingest + solve, returning (x, perf).

    controls: a controls dict, or None to read them from `fv_solution`
    (defaults to <case_dir>/system/fvSolution).  `allow_degenerate` is
    forwarded to the sidecar-free comm reconstruction (repeated-
    coefficient runs raise otherwise — a uniquely-covered degenerate
    pairing can be accepted with True, at the caller's risk)."""
    from ogl_tpu import foam

    if controls is None:
        fv = fv_solution or os.path.join(case_dir, "system", "fvSolution")
        controls = load_fv_solution(fv, field)
    ranks, b = read_exported_case(case_dir, field, time,
                                  allow_degenerate=allow_degenerate)
    name = f"{field}_replay"
    if len(ranks) == 1:
        return foam.solve(name, ranks[0], b, controls)
    if mesh is None:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:len(ranks)]), ("x",))
    return foam.solve_distributed(name, ranks, b, controls, mesh=mesh)
