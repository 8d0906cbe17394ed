"""DistMatrix construction from per-rank LDU systems — the reference's
actual distributed path: each MPI rank owns an LduMatrix plus processor
interfaces, from which it builds a CommunicationPattern
(HostMatrix.C:252-306), a localized partition (Partition.H:57-70) and a
local + non-local distributed matrix (CsrMatrixWrapper.H:163-210).

Pairwise ordering contract (same as OpenFOAM processor patches): for two
ranks a and b, the k-th face of a's interface(s) to b couples to the k-th
face of b's interface(s) to a, with multiple interfaces per pair listed in
matching order on both sides.  The halo buffer uses one slot per
processor-interface face in natural enumeration order (reference
HostMatrix.C:412-436) — NOT deduplicated by column, exactly like the
reference's recv buffer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ogl_tpu.core import ldu as ldu_mod
from ogl_tpu.dist.partition import DistMatrix, HaloPlan, _ell_pack

__all__ = ["dist_from_ldu_ranks"]


def dist_from_ldu_ranks(ranks: list, dtype=np.float64) -> DistMatrix:
    """Build a sharded DistMatrix from one LduMatrix (with proc_interfaces)
    per rank."""
    p = len(ranks)
    local_sizes = tuple(m.n for m in ranks)
    n_local = max(local_sizes)
    global_n = sum(local_sizes)

    loc = []  # per rank (rows, cols, vals)
    halo = []  # per rank (rows, slots, vals)
    halo_sizes = []
    sends = []  # per rank {nbr: local send idx}
    for m in ranks:
        coo = ldu_mod.ldu_to_coo_host(m, dtype=dtype)
        loc.append((np.asarray(coo.rows, np.int64), np.asarray(coo.cols, np.int64),
                    np.asarray(coo.vals)))
        rows, slots, perm = ldu_mod.build_non_local_sparsity(m)
        if m.proc_interfaces:
            iface = np.concatenate([np.asarray(pi.coeffs) for pi in m.proc_interfaces])
            hvals = (-iface)[perm]  # negated bouCoeffs (HostMatrix.C:204)
        else:
            hvals = np.zeros(0, dtype)
        halo.append((rows.astype(np.int64), slots.astype(np.int64), hvals.astype(dtype)))
        halo_sizes.append(sum(len(pi.face_cells) for pi in m.proc_interfaces))
        send, _ = ldu_mod.communication_pattern(m)
        sends.append(send)

    halo_size = max(max(halo_sizes, default=0), 1)

    # recv slot layout per rank: natural interface-face enumeration, so the
    # slots owned by neighbor r are the positions of r's interfaces in that
    # enumeration (in interface order) — matching r's send order to us by
    # the pairwise contract.
    recv_slots = []  # per rank {nbr: slot array}
    for m in ranks:
        slots_of = {}
        ctr = 0
        for pi in m.proc_interfaces:
            r = int(pi.neighbor)
            k = len(pi.face_cells)
            slots_of.setdefault(r, []).append(np.arange(ctr, ctr + k))
            ctr += k
        recv_slots.append({r: np.concatenate(v) for r, v in slots_of.items()})

    # ppermute schedule by ring offset
    per_offset: dict[int, dict[int, np.ndarray]] = {}
    for owner in range(p):
        for req, sidx in sends[owner].items():
            d = (req - owner) % p
            per_offset.setdefault(d, {})[owner] = np.asarray(sidx, np.int64)
    offsets = tuple(sorted(per_offset))
    send_idx_list, recv_pos_list = [], []
    for d in offsets:
        owners = per_offset[d]
        s = max(len(v) for v in owners.values())
        sidx = np.zeros((p, s), np.int32)
        rpos = np.full((p, s), halo_size, np.int32)
        for owner, v in owners.items():
            req = (owner + d) % p
            sidx[owner, : len(v)] = v
            slots = recv_slots[req][owner]
            assert len(slots) == len(v), (
                f"pairwise interface mismatch: rank {owner} sends {len(v)} "
                f"faces to {req}, which expects {len(slots)}"
            )
            rpos[req, : len(slots)] = slots
        send_idx_list.append(jnp.asarray(sidx))
        recv_pos_list.append(jnp.asarray(rpos))

    plan = HaloPlan(
        send_idx=tuple(send_idx_list),
        recv_pos=tuple(recv_pos_list),
        offsets=offsets,
        halo_size=halo_size,
        n_parts=p,
    )

    loc_w = max(
        (int(np.bincount(r).max()) for r, _, _ in loc if len(r)), default=1
    )
    halo_w = max(
        (int(np.bincount(r).max()) for r, _, _ in halo if len(r)), default=1
    )
    lc = np.zeros((p, n_local, loc_w), np.int32)
    lv = np.zeros((p, n_local, loc_w), dtype)
    hc = np.zeros((p, n_local, halo_w), np.int32)
    hv = np.zeros((p, n_local, halo_w), dtype)
    for i in range(p):
        lr, lcc, lvv = loc[i]
        lc[i], lv[i] = _ell_pack(n_local, lr, lcc, lvv, loc_w, dtype)
        hr, hs, hvv = halo[i]
        hc[i], hv[i] = _ell_pack(n_local, hr, hs, hvv, halo_w, dtype)

    return DistMatrix(
        local_cols=jnp.asarray(lc),
        local_vals=jnp.asarray(lv),
        halo_cols=jnp.asarray(hc),
        halo_vals=jnp.asarray(hv),
        plan=plan,
        n_local=n_local,
        local_sizes=local_sizes,
        global_n=global_n,
    )


def update_values(dm: DistMatrix, ranks: list, dtype=np.float64) -> DistMatrix:
    """Steady-state coefficient update: same sparsity, new values (the
    distributed analogue of the reference's update_local_matrix_data /
    update_non_local_matrix_data, HostMatrix.C:593-732).  The halo plan,
    column tables, and shapes are reused; only the two value stacks are
    rebuilt and swapped in."""
    import dataclasses

    p = len(ranks)
    lv = np.zeros(dm.local_vals.shape, dtype)
    hv = np.zeros(dm.halo_vals.shape, dtype)
    for i, m in enumerate(ranks):
        coo = ldu_mod.ldu_to_coo_host(m, dtype=dtype)
        lr = np.asarray(coo.rows, np.int64)
        counts = np.bincount(lr, minlength=dm.n_local)
        starts = np.zeros(dm.n_local + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slot = np.arange(len(lr)) - starts[lr]
        lv[i][lr, slot] = np.asarray(coo.vals)
        rows, _, perm = ldu_mod.build_non_local_sparsity(m)
        if m.proc_interfaces:
            iface = np.concatenate([np.asarray(pi.coeffs) for pi in m.proc_interfaces])
            hvals = (-iface)[perm]
            hr = rows.astype(np.int64)
            counts = np.bincount(hr, minlength=dm.n_local)
            starts = np.zeros(dm.n_local + 1, np.int64)
            np.cumsum(counts, out=starts[1:])
            slot = np.arange(len(hr)) - starts[hr]
            hv[i][hr, slot] = hvals
    return dataclasses.replace(
        dm, local_vals=jnp.asarray(lv), halo_vals=jnp.asarray(hv)
    )
