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

Steady-state coefficient updates follow the reference's bulk-copy +
on-device gather design (HostMatrix.C:684-704 row_gather path +
CsrMatrixWrapper.H:74-136 in-place value overwrite): the raw per-rank LDU
blocks are packed into one padded (P, S) source stack on the host (a
vectorised memcpy), uploaded once, and two jit'd gathers place every value
into the stacked local/halo storages — no per-entry host work.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ogl_tpu.core import ldu as ldu_mod
from ogl_tpu.dist.partition import (
    DiaStack,
    DistMatrix,
    HaloPlan,
    pack_halo_stack,
    pack_local_stack,
)

__all__ = ["DistAssembler", "dist_from_ldu_ranks", "build_halo_plan"]


def build_halo_plan(iface_lists, halo_size: int) -> HaloPlan:
    """Static ppermute schedule from every rank's processor-interface list
    (per rank: [(neighbor, face_cells), ...] in interface order).

    Send side: face cells of all interfaces to a rank, interface order
    (the reference CommunicationPattern, HostMatrix.C:252-306).  Recv side:
    halo slots are the natural interface-face enumeration, so neighbor r's
    block sits at the positions of r's interfaces in that enumeration —
    matching r's send order by the pairwise contract.

    SELF-neighbor interfaces (neighbor == own rank, e.g. a cyclic patch
    whose two sides land on the same rank routed through the exchange —
    see ldu.decompose cyclic_via_halo) must come in consecutive PAIRS in
    the per-self interface order; the k-th face of a pair's first
    interface couples with the k-th face of its second.  The d = 0
    ppermute class this creates is a real identity-permutation collective
    ([(i, i)]), so the same compiled program exercises halo
    gather/exchange/scatter even on a single-device mesh."""
    p = len(iface_lists)
    sends = []  # per rank {req: concatenated local send indices}
    recv_slots = []  # per rank {nbr: slot array}
    for rank, ifaces in enumerate(iface_lists):
        s: dict[int, list] = {}
        slots_of: dict[int, list] = {}
        ctr = 0
        for nbr, fc in ifaces:
            fc = np.asarray(fc, np.int64)
            s.setdefault(int(nbr), []).append(fc)
            slots_of.setdefault(int(nbr), []).append(
                np.arange(ctr, ctr + len(fc)))
            ctr += len(fc)
        # self-pairs: payload order is the interface order (A, B, ...);
        # A's payload must land in B's slots and vice versa, so the recv
        # slot concat swaps within each consecutive pair
        if rank in slots_of:
            pair_slots = slots_of[rank]
            if len(pair_slots) % 2:
                raise ValueError(
                    f"rank {rank}: self-neighbor interfaces must come in "
                    f"pairs (two coupled sides), got {len(pair_slots)}")
            for a, b in zip(s[rank][0::2], s[rank][1::2]):
                if len(a) != len(b):
                    raise ValueError(
                        f"rank {rank}: self-neighbor interface pair has "
                        f"mismatched face counts {len(a)} != {len(b)}")
            slots_of[rank] = [pair_slots[k ^ 1] for k in range(len(pair_slots))]
        sends.append({r: np.concatenate(v) for r, v in s.items()})
        recv_slots.append({r: np.concatenate(v) for r, v in slots_of.items()})

    per_offset: dict[int, dict[int, np.ndarray]] = {}
    for owner in range(p):
        for req, sidx in sends[owner].items():
            d = (req - owner) % p
            per_offset.setdefault(d, {})[owner] = np.asarray(sidx, np.int64)
    offsets = tuple(sorted(per_offset))

    # affine fast-path detection (dist.affine): every class must have
    # every part participating with structurally uniform arithmetic runs
    send_affine = recv_affine = None
    if offsets and all(len(per_offset[d]) == p for d in offsets):
        from ogl_tpu.dist.affine import build_send_affine

        try:
            aff = build_send_affine(
                # send runs indexed by the SENDING part (owner o ships to
                # (o+d)%p), recv runs by the RECEIVING part (i hears from
                # (i-d)%p) — matching affine_exchange's my-indexing
                [[per_offset[d][o] for o in range(p)] for d in offsets],
                [[recv_slots[i][(i - d) % p] for i in range(p)]
                 for d in offsets])
        except KeyError:
            aff = None  # a receiver lacks the pairing interface
        if aff is not None:
            send_affine, recv_affine = aff
    send_idx_list, recv_pos_list = [], []
    for d in offsets:
        owners = per_offset[d]
        s = max(len(v) for v in owners.values())
        sidx = np.zeros((p, s), np.int32)
        rpos = np.full((p, s), halo_size, np.int32)
        for owner, v in owners.items():
            req = (owner + d) % p
            sidx[owner, : len(v)] = v
            slots = recv_slots[req].get(owner)
            if slots is None:
                raise ValueError(
                    f"pairwise interface mismatch: rank {owner} sends to "
                    f"{req}, but {req} has no interface back to {owner}")
            if len(slots) != len(v):
                raise ValueError(
                    f"pairwise interface mismatch: rank {owner} sends "
                    f"{len(v)} faces to {req}, which expects {len(slots)}")
            rpos[req, : len(slots)] = slots
        send_idx_list.append(jnp.asarray(sidx))
        recv_pos_list.append(jnp.asarray(rpos))

    return HaloPlan(
        send_idx=tuple(send_idx_list),
        recv_pos=tuple(recv_pos_list),
        offsets=offsets,
        halo_size=halo_size,
        n_parts=p,
        send_affine=send_affine,
        recv_affine=recv_affine,
    )


def _rank_source_blocks(m: ldu_mod.LduMatrix, dtype) -> list:
    """The rank's source blocks [upper, (lower,) diag, (-local_iface,)
    (-proc_iface)] (signs applied; reference HostMatrix.C:204 negates
    interface bouCoeffs).  The local prefix is the shared single-device
    layout (ldu._host_blocks) so the two paths cannot drift; blocks stay
    split so steady-state updates can upload only changed ones."""
    sp_stub = ldu_mod.LduSparsity(
        n=m.n, n_faces=m.n_faces, symmetric=m.symmetric,
        rows=np.zeros(0, np.int32), cols=np.zeros(0, np.int32),
        permute=np.zeros(0, np.int32),
        n_local_iface=sum(len(li.rows) for li in m.local_interfaces),
    )
    parts = ldu_mod._host_blocks(sp_stub, m, dtype)
    if m.proc_interfaces:
        parts.append(-np.concatenate([np.asarray(pi.coeffs, dtype)
                                      for pi in m.proc_interfaces]))
    return parts


def _rank_sources(m: ldu_mod.LduMatrix, dtype):
    """Concatenated _rank_source_blocks (the construction-time layout)."""
    parts = _rank_source_blocks(m, dtype)
    return np.concatenate(parts) if len(parts) > 1 else np.asarray(parts[0])


@partial(jax.jit, static_argnames=("src_size",))
def _stack_src_blocks(blocks, *, src_size):
    """Per-rank tuples of (HBM-resident, delta-uploaded) source blocks ->
    the padded (P, S+1) source stack, entirely on device (the trailing
    slot stays 0: it is the parking slot pad gathers read)."""
    rows = []
    for blks in blocks:
        src = jnp.concatenate(blks) if len(blks) > 1 else blks[0]
        rows.append(jnp.pad(src, (0, src_size + 1 - src.shape[0])))
    return jnp.stack(rows)


@partial(jax.jit, static_argnames=("local_shape",))
def _assemble_values(src_stack, perm_local, dest_local, perm_halo, scale,
                     *, local_shape):
    """(P, S) source stack -> (stacked local value storage, halo values).
    Pure gathers/scatter with static shapes; pads read the zero tail slot."""
    vals_l = scale * jnp.take_along_axis(src_stack, perm_local, axis=1)
    size = 1
    for s in local_shape:
        size *= int(s)

    def place(v, d):
        return jnp.zeros(size + 1, v.dtype).at[d].add(v)[:size]

    flat = jax.vmap(place)(vals_l, dest_local)
    local_vals = flat.reshape((flat.shape[0],) + local_shape)
    halo_vals = scale * jnp.take_along_axis(src_stack, perm_halo, axis=1)
    return local_vals, halo_vals


class DistAssembler:
    """Builds a DistMatrix from per-rank LduMatrix systems once, then
    re-assembles coefficients on device every later step (the
    PersistentSparsityPattern + update split of the reference)."""

    def __init__(self, ranks: list, dtype=np.float64, local_format: str = "auto",
                 scale: float = 1.0):
        self.dtype = np.dtype(dtype)
        # `scaling` applies to the MATRIX (reference HostMatrix.C:33); the
        # caller must scale b by the same factor (lduLduBase.H:244-252) so
        # the solution stays invariant
        self.scale = float(scale)
        p = len(ranks)
        local_sizes = tuple(m.n for m in ranks)
        n_local = max(local_sizes)
        global_n = sum(local_sizes)

        loc_shards = []   # (rows, cols, vals)
        halo_shards = []  # (rows, slots, vals)
        halo_sizes = []
        self._sp = []     # per-rank LduSparsity
        self._halo_perm = []  # per-rank halo permute into proc-iface concat
        src_lens = []
        for m in ranks:
            sp = ldu_mod.build_local_sparsity(m)
            self._sp.append(sp)
            src = self._sources(m)
            src_lens.append(len(src))
            vals = src[sp.permute]
            loc_shards.append((sp.rows.astype(np.int64), sp.cols.astype(np.int64), vals))
            hrows, hslots, hperm = ldu_mod.build_non_local_sparsity(m)
            self._halo_perm.append(hperm.astype(np.int64))
            off_proc = len(src) - sum(len(pi.face_cells) for pi in m.proc_interfaces)
            hvals = src[off_proc + hperm] if len(hperm) else np.zeros(0, self.dtype)
            halo_shards.append((hrows.astype(np.int64), hslots.astype(np.int64), hvals))
            halo_sizes.append(sum(len(pi.face_cells) for pi in m.proc_interfaces))

        halo_size = max(max(halo_sizes, default=0), 1)
        iface_lists = [[(int(pi.neighbor), np.asarray(pi.face_cells, np.int64))
                        for pi in m.proc_interfaces] for m in ranks]
        plan = build_halo_plan(iface_lists, halo_size)

        local, dest_local = pack_local_stack(
            loc_shards, n_local, self.dtype, fmt=local_format
        )
        halo = pack_halo_stack(halo_shards, self.dtype)

        from ogl_tpu.dist.affine import build_apply_affine

        self.dm = DistMatrix(
            local=local,
            halo=halo,
            plan=plan,
            n_local=n_local,
            local_sizes=local_sizes,
            global_n=global_n,
            halo_sizes=tuple(len(h[0]) for h in halo_shards),
            apply_affine=(build_apply_affine(halo_shards)
                          if plan.send_affine is not None else None),
        )

        # ---- update machinery (device gathers; pads read the zero slot S)
        self._src_size = max(src_lens) if src_lens else 1
        self._src_lens = src_lens
        s_pad = self._src_size  # parking index (src stack padded by one)
        e_l = dest_local.shape[1]
        perm_local = np.full((p, e_l), s_pad, np.int32)
        for i, sp in enumerate(self._sp):
            perm_local[i, : sp.nnz] = sp.permute
        e_h = int(halo.vals.shape[1])
        perm_halo = np.full((p, e_h), s_pad, np.int32)
        for i, (m, hperm) in enumerate(zip(ranks, self._halo_perm)):
            if len(hperm):
                off_proc = src_lens[i] - sum(len(pi.face_cells) for pi in m.proc_interfaces)
                perm_halo[i, : len(hperm)] = off_proc + hperm
        self._perm_local = jnp.asarray(perm_local)
        self._dest_local = dest_local
        self._perm_halo = jnp.asarray(perm_halo)
        if isinstance(local, DiaStack):
            self._local_kind = "Dia"
            self._local_shape = tuple(int(s) for s in local.data.shape[1:])
        else:  # GdiaStack / EllStack both store values under .vals
            self._local_kind = type(local).__name__.removesuffix("Stack")
            self._local_shape = tuple(int(s) for s in local.vals.shape[1:])

        # seed the host-change baseline from the construction-time values
        # (private copies): the first update() can then detect an
        # unchanged operator, which gates preconditioner regeneration
        self._blk_prev = [[np.array(x) for x in
                           _rank_source_blocks(m, self.dtype)] for m in ranks]
        self._blk_dev = [[None] * len(b) for b in self._blk_prev]

    def _sources(self, m) -> np.ndarray:
        """Per-rank source vector with `scaling` applied (the scaled matrix
        is what every consumer — local/halo storage, Schwarz factorisation,
        export — must see, matching the reference's scaled HostMatrix)."""
        src = _rank_sources(m, self.dtype)
        if self.scale != 1.0:
            src = src * np.asarray(self.scale, self.dtype)
        return src

    def shard_triples(self, ranks):
        """Per-shard local-block COO triples with CURRENT values (host) —
        what the Schwarz preconditioner setup factorises, the reference's
        dist_A->get_local_matrix() (Preconditioner.H:62-66).  Reuses the
        source blocks gathered by the most recent update of the same step
        instead of re-concatenating every block."""
        blks = getattr(self, "_blocks_cache", None)
        if blks is not None and len(blks) == len(self._sp):
            srcs = [np.concatenate(b) if len(b) > 1 else np.asarray(b[0])
                    for b in blks]
            if self.scale != 1.0:  # cached blocks are raw; _sources scales
                srcs = [s * np.asarray(self.scale, s.dtype) for s in srcs]
        else:
            srcs = [self._sources(m) for m in ranks]
        out = []
        for sp, src in zip(self._sp, srcs):
            out.append((sp.rows.astype(np.int64), sp.cols.astype(np.int64),
                        src[sp.permute]))
        return out

    def _upload_changed_blocks(self, ranks) -> tuple:
        """Delta coefficient upload, per (rank, block): only source blocks
        whose values changed since the previous step cross the host->device
        boundary (cf. FoamSolver._upload_changed_blocks — the single-device
        twin); unchanged blocks reuse their HBM-resident upload.  Validates
        that each rank's source length matches construction — a changed
        face count means the sparsity changed and the cached permute tables
        would silently gather stale positions."""
        blks_host = []
        for i, m in enumerate(ranks):
            b = _rank_source_blocks(m, self.dtype)
            if sum(len(x) for x in b) != self._src_lens[i]:
                raise ValueError(
                    f"rank {i}: source length {sum(len(x) for x in b)} != "
                    f"{self._src_lens[i]} at construction — the sparsity "
                    "changed; rebuild the DistAssembler")
            blks_host.append(b)
        if getattr(self, "_blk_prev", None) is None or \
                len(self._blk_prev) != len(blks_host):
            self._blk_prev = [[None] * len(b) for b in blks_host]
            self._blk_dev = [[None] * len(b) for b in blks_host]
        uploaded = total = changed = 0
        out = []
        for i, blks in enumerate(blks_host):
            row = []
            for j, blk in enumerate(blks):
                prev = self._blk_prev[i][j]
                dev = self._blk_dev[i][j]
                host_same = (prev is not None and prev.shape == blk.shape
                             and np.array_equal(prev, blk))
                if not host_same:
                    changed += 1
                    self._blk_prev[i][j] = np.array(blk)  # private baseline
                if dev is None or not host_same:
                    dev = jnp.asarray(blk)
                    self._blk_dev[i][j] = dev
                    uploaded += 1
                row.append(dev)
                total += 1
            out.append(tuple(row))
        self.last_blocks_uploaded = (uploaded, total)
        self.last_blocks_changed = (changed, total)
        self._blocks_cache = blks_host  # raw blocks; shard_triples re-scales
        return tuple(out)

    def update(self, ranks, scale=1.0) -> DistMatrix:
        """Steady-state coefficient update: same sparsity, new values — the
        distributed analogue of update_local_matrix_data /
        update_non_local_matrix_data + the device value overwrite
        (HostMatrix.C:593-732, CsrMatrixWrapper.H:74-136).  The blocks stay
        raw on the host; `scaling` is folded into the device gather."""
        blocks = self._upload_changed_blocks(ranks)
        src = _stack_src_blocks(blocks, src_size=self._src_size)
        local_vals, halo_vals = _assemble_values(
            src, self._perm_local, self._dest_local, self._perm_halo,
            jnp.asarray(self.scale * scale, self.dtype),
            local_shape=self._local_shape,
        )
        dm = self.dm
        if isinstance(dm.local, DiaStack):
            local = dataclasses.replace(dm.local, data=local_vals)
        else:
            local = dataclasses.replace(dm.local, vals=local_vals)
        halo = dataclasses.replace(dm.halo, vals=halo_vals)
        self.dm = dataclasses.replace(dm, local=local, halo=halo)
        return self.dm


def dist_from_ldu_ranks(ranks: list, dtype=np.float64,
                        local_format: str = "auto") -> DistMatrix:
    """Build a sharded DistMatrix from one LduMatrix (with proc_interfaces)
    per rank (one-shot; use DistAssembler to keep the update path)."""
    return DistAssembler(ranks, dtype=dtype, local_format=local_format).dm
