"""LDU→row-major conversion tests.

Ports the reference's gtest fixtures verbatim (unitTests/test_HostMatrix.C:
the 5×5 symmetric/non-symmetric matrices) to pin conversion semantics, then
property-tests against dense assembly on random LDU systems.
"""

import numpy as np
import pytest

from ogl_tpu.core import formats, ldu

# The 5×5 fixture of test_HostMatrix.C:70-107:
#     0  1  2  3  4
# 0 | x  x  .  x  .  |
# 1 | x  x  x  .  x  |
# 2 | .  x  x  x  .  |
# 3 | x  .  x  x  x  |
# 4 | .  x  .  x  x  |
UPPER_ADDR = np.array([1, 3, 2, 4, 3, 4])  # neighbour (col of upper entry)
LOWER_ADDR = np.array([0, 0, 1, 1, 2, 3])  # owner (row of upper entry)


def test_init_local_sparsity_symmetric():
    rows, cols, permute = ldu.init_local_sparsity(5, LOWER_ADDR, UPPER_ADDR, True)
    np.testing.assert_array_equal(rows, [0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4])
    np.testing.assert_array_equal(cols, [0, 1, 3, 0, 1, 2, 4, 1, 2, 3, 0, 2, 3, 4, 1, 3, 4])
    np.testing.assert_array_equal(permute, [6, 0, 1, 0, 7, 2, 3, 2, 8, 4, 1, 4, 9, 5, 3, 5, 10])


def test_symmetric_update():
    """test_HostMatrix.C:8-37 — fixture permute, diag+upper sources."""
    sp = ldu.LduSparsity(
        n=5, n_faces=6, symmetric=True,
        rows=np.zeros(17, np.int32), cols=np.zeros(17, np.int32),
        permute=np.array([6, 0, 2, 0, 7, 1, 4, 1, 8, 3, 2, 3, 9, 5, 4, 5, 10], np.int32),
        n_local_iface=0,
    )
    d = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    u = np.array([10.0, 11.0, 20.0, 12.0, 21.0, 13.0])
    out = ldu.assemble_coeffs(sp, d, u)
    exp = [1, 10, 20, 10, 2, 11, 21, 11, 3, 12, 20, 12, 4, 13, 21, 13, 5]
    np.testing.assert_allclose(np.asarray(out), exp)


def test_symmetric_update_applies_scale():
    """The reference's symmetric_update drops `scale` via an operator-
    precedence bug (HostMatrixFreeFunctions.C:27-28, SURVEY Appendix B).
    We assert the *intended* semantics: scale multiplies every entry."""
    sp = ldu.LduSparsity(
        n=5, n_faces=6, symmetric=True,
        rows=np.zeros(17, np.int32), cols=np.zeros(17, np.int32),
        permute=np.array([6, 0, 2, 0, 7, 1, 4, 1, 8, 3, 2, 3, 9, 5, 4, 5, 10], np.int32),
        n_local_iface=0,
    )
    d = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    u = np.array([10.0, 11.0, 20.0, 12.0, 21.0, 13.0])
    out = ldu.assemble_coeffs(sp, d, u, scale=2.0)
    exp = 2.0 * np.array(
        [1, 10, 20, 10, 2, 11, 21, 11, 3, 12, 20, 12, 4, 13, 21, 13, 5], np.float64
    )
    np.testing.assert_allclose(np.asarray(out), exp)


def test_non_symmetric_update():
    """test_HostMatrix.C:39-68."""
    sp = ldu.LduSparsity(
        n=5, n_faces=6, symmetric=False,
        rows=np.zeros(17, np.int32), cols=np.zeros(17, np.int32),
        permute=np.array([12, 0, 1, 6, 13, 2, 3, 7, 14, 4, 8, 9, 15, 5, 10, 11, 16], np.int32),
        n_local_iface=0,
    )
    d = np.ones(5)
    u = np.array([1.0, 2.0, 1.0, 2.0, 1.0, 1.0])
    l = np.array([2.0, 2.0, 3.0, 2.0, 3.0, 2.0])
    out = ldu.assemble_coeffs(sp, d, u, lower=l)
    exp = [1, 1, 2, 2, 1, 1, 2, 2, 1, 1, 3, 2, 1, 1, 3, 2, 1]
    np.testing.assert_allclose(np.asarray(out), exp)


def _dense_from_ldu(m: ldu.LduMatrix) -> np.ndarray:
    a = np.zeros((m.n, m.n))
    np.fill_diagonal(a, m.diag)
    lo = m.upper if m.symmetric else m.lower
    for f in range(m.n_faces):
        a[m.lower_addr[f], m.upper_addr[f]] += m.upper[f]
        a[m.upper_addr[f], m.lower_addr[f]] += lo[f]
    for li in m.local_interfaces:
        for r, c, v in zip(li.rows, li.cols, li.coeffs):
            a[r, c] += -v
    return a


def _random_ldu(rng, n=20, symmetric=True, with_local_iface=False):
    # random face graph: each face connects owner < neighbour, upper rows
    # (owner per face) monotonically ascending like OpenFOAM guarantees
    pairs = set()
    while len(pairs) < 3 * n:
        i, j = rng.integers(0, n, 2)
        if i != j:
            pairs.add((min(i, j), max(i, j)))
    pairs = sorted(pairs)
    lower_addr = np.array([p[0] for p in pairs])
    upper_addr = np.array([p[1] for p in pairs])
    nf = len(pairs)
    li = ()
    if with_local_iface:
        # couple cell 0<->n-1 (cyclic-ish), not already adjacent
        if (0, n - 1) not in set(pairs):
            li = (
                ldu.LocalInterface(
                    rows=np.array([0, n - 1]),
                    cols=np.array([n - 1, 0]),
                    coeffs=rng.normal(size=2),
                ),
            )
    return ldu.LduMatrix(
        n=n,
        lower_addr=lower_addr,
        upper_addr=upper_addr,
        diag=rng.normal(size=n) + 10.0,
        upper=rng.normal(size=nf),
        lower=None if symmetric else rng.normal(size=nf),
        local_interfaces=li,
    )


@pytest.mark.parametrize("symmetric", [True, False])
@pytest.mark.parametrize("with_iface", [True, False])
def test_ldu_to_coo_matches_dense(rng, symmetric, with_iface):
    m = _random_ldu(rng, n=24, symmetric=symmetric, with_local_iface=with_iface)
    coo = ldu.ldu_to_coo(m)
    np.testing.assert_allclose(formats.to_dense(coo), _dense_from_ldu(m), atol=1e-12)
    # row-major sortedness (required for distributed correctness,
    # reference HostMatrix.C:449-456)
    r = np.asarray(coo.rows)
    c = np.asarray(coo.cols)
    key = r.astype(np.int64) * m.n + c
    assert np.all(np.diff(key) > 0)


def test_ldu_to_coo_scaling(rng):
    m = _random_ldu(rng, n=16)
    np.testing.assert_allclose(
        formats.to_dense(ldu.ldu_to_coo(m, scale=0.5)),
        0.5 * _dense_from_ldu(m),
        atol=1e-12,
    )


def test_non_local_sparsity_row_major_stable():
    """Non-local entries sorted by row, ties keep interface order
    (reference HostMatrix.C:448-457)."""
    m = ldu.LduMatrix(
        n=4,
        lower_addr=np.array([0, 1, 2]),
        upper_addr=np.array([1, 2, 3]),
        diag=np.ones(4),
        upper=np.ones(3),
        proc_interfaces=(
            ldu.ProcInterface(neighbor=1, face_cells=np.array([3, 1]), coeffs=np.ones(2)),
            ldu.ProcInterface(neighbor=2, face_cells=np.array([1, 0]), coeffs=np.ones(2)),
        ),
    )
    rows, halo_cols, permute = ldu.build_non_local_sparsity(m)
    np.testing.assert_array_equal(rows, [0, 1, 1, 3])
    # natural face enumeration: [3,1,1,0] -> slots [0,1,2,3]; row-sorted
    # stable puts slot 3 (row 0) first, then slots 1,2 (row 1), slot 0 (row 3)
    np.testing.assert_array_equal(halo_cols, [3, 1, 2, 0])
    np.testing.assert_array_equal(permute, [3, 1, 2, 0])


def test_communication_pattern_groups_by_rank():
    m = ldu.LduMatrix(
        n=4,
        lower_addr=np.array([0]),
        upper_addr=np.array([1]),
        diag=np.ones(4),
        upper=np.ones(1),
        proc_interfaces=(
            ldu.ProcInterface(neighbor=2, face_cells=np.array([3]), coeffs=np.ones(1)),
            ldu.ProcInterface(neighbor=1, face_cells=np.array([0, 2]), coeffs=np.ones(2)),
            ldu.ProcInterface(neighbor=2, face_cells=np.array([1]), coeffs=np.ones(1)),
        ),
    )
    send, slots = ldu.communication_pattern(m)
    assert list(send.keys()) == [1, 2]  # ascending rank (std::map semantics)
    np.testing.assert_array_equal(send[1], [0, 2])
    np.testing.assert_array_equal(send[2], [3, 1])
    assert slots == [(2, 0), (1, 0), (1, 1), (2, 1)]
