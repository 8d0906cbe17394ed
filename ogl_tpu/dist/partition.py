"""Mesh-decomposition partitioning and the halo-exchange plan.

The reference realises distribution as one matrix shard per MPI rank with a
`localized_partition` + `sparse_communicator` doing neighbor sends during
SpMV (Partition.H:57-70, CsrMatrixWrapper.H:163-210, and the
CommunicationPattern built from processor interfaces, HostMatrix.C:252-306).

TPU-first re-design (SURVEY.md §2c mapping):
  * shards live on a jax.sharding.Mesh axis; every per-shard array is
    stacked on a leading parts axis and shard_map'd;
  * the communication pattern compiles to a STATIC schedule of
    `lax.ppermute` rounds — one per ring-offset class d=(dst−src) mod P —
    so a 1/2/3-D domain decomposition needs only a handful of permutes,
    each riding ICI neighbour links;
  * the non-local ("halo-column") matrix follows the reference's layout:
    row-major sorted entries whose columns index a halo buffer
    (HostMatrix.C:438-466 — row-major sortedness is required for
    convergence, :449-456), except the halo buffer is deduplicated by
    global column (each remote value appears once).

All shapes are padded uniform across shards (SPMD requires identical local
programs); pads are index 0 with value 0 and parked halo slots, so they are
numerically inert.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ogl_tpu.core.formats import Coo, static_field, _pytree

__all__ = ["DistMatrix", "HaloPlan", "partition_coo", "gather_global"]


@_pytree
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Static ppermute schedule.  For each ring offset d (static tuple):
    send_idx[k]: (P, S_k) local row indices to ship to rank (i+d) mod P
    recv_pos[k]: (P, S_k) halo-buffer slots for data arriving from
                 (i−d) mod P; pads park at slot `halo_size` (sliced off).
    """

    send_idx: tuple  # tuple of (P, S_k) int32 arrays
    recv_pos: tuple  # tuple of (P, S_k) int32 arrays
    offsets: tuple[int, ...] = static_field()
    halo_size: int = static_field()
    n_parts: int = static_field()


@_pytree
@dataclasses.dataclass(frozen=True)
class DistMatrix:
    """Sharded matrix: per-shard local ELL (cols = local indices) plus
    per-shard non-local ELL (cols = halo-buffer slots), stacked on the
    parts axis, and the halo plan."""

    local_cols: jnp.ndarray  # (P, n_local, K)
    local_vals: jnp.ndarray
    halo_cols: jnp.ndarray  # (P, n_local, Kh) into halo buffer
    halo_vals: jnp.ndarray
    plan: HaloPlan
    n_local: int = static_field()
    local_sizes: tuple[int, ...] = static_field()  # true rows per shard
    global_n: int = static_field()

    @property
    def n_parts(self) -> int:
        return len(self.local_sizes)

    @property
    def dtype(self):
        return self.local_vals.dtype


def _ell_pack(n_rows: int, rows, cols, vals, width: int, dtype):
    """Pack row-major sorted triplets into an (n_rows, width) ELL block;
    pad cols point at row 0 with val 0 (inert)."""
    ec = np.zeros((n_rows, width), np.int32)
    ev = np.zeros((n_rows, width), dtype)
    if len(rows):
        counts = np.bincount(rows, minlength=n_rows)
        starts = np.zeros(n_rows + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slot = np.arange(len(rows)) - starts[rows]
        ec[rows, slot] = cols
        ev[rows, slot] = vals
    return ec, ev


def partition_coo(coo: Coo, n_parts: int) -> DistMatrix:
    """Contiguous block (1-D) partition of a global row-major COO into a
    DistMatrix — the structural equivalent of decomposePar + the reference's
    per-rank HostMatrix construction, derived from the global operator.
    (decomposition by contiguous row blocks matches `decomposePar simple`)."""
    n = coo.shape[0]
    p = int(n_parts)
    rows = np.asarray(jax.device_get(coo.rows)).astype(np.int64)
    cols = np.asarray(jax.device_get(coo.cols)).astype(np.int64)
    vals = np.asarray(jax.device_get(coo.vals))
    dtype = vals.dtype

    bounds = [round(i * n / p) for i in range(p + 1)]
    local_sizes = tuple(bounds[i + 1] - bounds[i] for i in range(p))
    n_local = max(local_sizes)
    owner = np.searchsorted(bounds, np.arange(n), side="right") - 1

    part_of_entry = owner[rows]
    is_local = owner[cols] == part_of_entry

    # ---- halo column sets: per part, unique remote cols, grouped by owner
    halo_cols_of = []  # part -> sorted np.array of global cols (owner-major)
    for i in range(p):
        sel = (part_of_entry == i) & ~is_local
        hc = np.unique(cols[sel])
        hc = hc[np.lexsort((hc, owner[hc]))]  # group by owner, ascending col
        halo_cols_of.append(hc)
    halo_size = max((len(h) for h in halo_cols_of), default=0)
    halo_size = max(halo_size, 1)

    # ---- ppermute schedule: offset classes d = (requester - owner) mod p
    per_offset: dict[int, list[tuple[int, np.ndarray]]] = {}
    for i in range(p):
        hc = halo_cols_of[i]
        for o in np.unique(owner[hc]) if len(hc) else []:
            d = (i - int(o)) % p
            sel = owner[hc] == o
            per_offset.setdefault(d, []).append((i, hc[sel]))
    offsets = tuple(sorted(per_offset))
    send_idx_list, recv_pos_list = [], []
    for d in offsets:
        entries = dict(per_offset[d])  # requester -> global cols
        s = max(len(v) for v in entries.values())
        sidx = np.zeros((p, s), np.int32)  # owner-side local indices (pad 0)
        rpos = np.full((p, s), halo_size, np.int32)  # requester-side slots
        for req, gcols in entries.items():
            own = (req - d) % p
            sidx[own, : len(gcols)] = (gcols - bounds[own]).astype(np.int32)
            # halo slots: positions of gcols within the requester's
            # (owner-major sorted) halo list
            lookup = {int(c): k for k, c in enumerate(halo_cols_of[req])}
            rpos[req, : len(gcols)] = np.array([lookup[int(c)] for c in gcols], np.int32)
        send_idx_list.append(jnp.asarray(sidx))
        recv_pos_list.append(jnp.asarray(rpos))

    plan = HaloPlan(
        send_idx=tuple(send_idx_list),
        recv_pos=tuple(recv_pos_list),
        offsets=offsets,
        halo_size=halo_size,
        n_parts=p,
    )

    # ---- pack local + halo ELL blocks per part (row-major preserved)
    loc_w = 1
    halo_w = 1
    packed = []
    for i in range(p):
        sel_l = (part_of_entry == i) & is_local
        sel_h = (part_of_entry == i) & ~is_local
        lr = rows[sel_l] - bounds[i]
        if sel_l.any():
            loc_w = max(loc_w, int(np.bincount(lr).max()))
        hr = rows[sel_h] - bounds[i]
        if sel_h.any():
            halo_w = max(halo_w, int(np.bincount(hr).max()))
        lookup = {int(c): k for k, c in enumerate(halo_cols_of[i])}
        hslots = np.array([lookup[int(c)] for c in cols[sel_h]], np.int64)
        packed.append((lr, cols[sel_l] - bounds[i], vals[sel_l], hr, hslots, vals[sel_h]))

    lc = np.zeros((p, n_local, loc_w), np.int32)
    lv = np.zeros((p, n_local, loc_w), dtype)
    hc = np.zeros((p, n_local, halo_w), np.int32)
    hv = np.zeros((p, n_local, halo_w), dtype)
    for i, (lr, lcols, lvals, hr, hcols, hvals) in enumerate(packed):
        lc[i], lv[i] = _ell_pack(n_local, lr, lcols, lvals, loc_w, dtype)
        hc[i], hv[i] = _ell_pack(n_local, hr, hcols, hvals, halo_w, dtype)

    return DistMatrix(
        local_cols=jnp.asarray(lc),
        local_vals=jnp.asarray(lv),
        halo_cols=jnp.asarray(hc),
        halo_vals=jnp.asarray(hv),
        plan=plan,
        n_local=n_local,
        local_sizes=local_sizes,
        global_n=n,
    )


def split_vector(dm: DistMatrix, x) -> np.ndarray:
    """Host-side: split a global vector into the (P, n_local) padded stack."""
    x = np.asarray(x)
    out = np.zeros((dm.n_parts, dm.n_local), x.dtype)
    off = 0
    for i, sz in enumerate(dm.local_sizes):
        out[i, :sz] = x[off : off + sz]
        off += sz
    return out


def gather_global(dm: DistMatrix, x_stack) -> np.ndarray:
    """Host-side inverse of split_vector."""
    x_stack = np.asarray(jax.device_get(x_stack))
    return np.concatenate([x_stack[i, :sz] for i, sz in enumerate(dm.local_sizes)])
