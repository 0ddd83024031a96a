"""RCM node renumbering (`tlfea.utils.reorder`).

Physics must be invariant under renumbering: the ALM gradient of the
renumbered system equals the permutation of the original gradient.
"""

import numpy as np
import jax.numpy as jnp

from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.elements.assembly import lumped_mass
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.solvers import System
from tlfea.solvers.common import grad_L
from tlfea.utils.reorder import apply_node_order, bandwidth, rcm_order
from tlfea.utils.tetmesh import box_t10_mesh


def test_rcm_reduces_bandwidth_and_preserves_physics():
    nodes, conn = box_t10_mesh(1.0, 0.3, 0.3, 8, 2, 2)
    perm = rcm_order(conn, len(nodes))
    nodes2, conn2 = apply_node_order(nodes, conn, perm)
    assert sorted(perm.tolist()) == list(range(len(nodes)))
    assert bandwidth(conn2) < bandwidth(conn)
    assert np.allclose(nodes2, nodes[perm])

    lam, mu = lame_from_E_nu(1e7, 0.3)
    mat = SVK(lam=jnp.asarray(lam), mu=jnp.asarray(mu),
              eta_damp=jnp.asarray(1e3), lam_damp=jnp.asarray(1e3))

    def build(nds, cn):
        fixed = np.nonzero(nds[:, 0] < 1e-12)[0]
        elems = feat10.build(nds, cn, rho=1000.0)
        return System(elems=elems, material=mat,
                      constraints=FixedCoefs.from_indices(fixed, nds)), fixed

    sys1, fixed1 = build(nodes, conn)
    sys2, fixed2 = build(nodes2, conn2)
    # Same constrained node SET under the permutation.
    assert sorted(perm[fixed2].tolist()) == sorted(fixed1.tolist())

    n = len(nodes)
    rng = np.random.default_rng(0)
    v1 = rng.normal(size=(n, 3)) * 0.1
    f1 = np.asarray(
        jnp.zeros((n, 3)).at[:, 2].add(lumped_mass(sys1.elems) * -9.81)
    )
    # lam duals must correspond to the same physical nodes: both systems'
    # constraints are coordinate-derived, so map via the permutation.
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    lam1 = rng.normal(size=(len(fixed1), 3))
    # fixed2 rows ordered by new index; original node of row k is perm[fixed2[k]]
    pos_in_fixed1 = {int(j): k for k, j in enumerate(fixed1)}
    lam2 = np.stack([lam1[pos_in_fixed1[int(perm[j])]] for j in fixed2])

    g1 = grad_L(jnp.asarray(v1), jnp.asarray(nodes), jnp.asarray(v1) * 0,
                jnp.asarray(lam1), jnp.asarray(f1), 1e-3, 1e6, sys1)
    g2 = grad_L(jnp.asarray(v1[perm]), jnp.asarray(nodes2),
                jnp.asarray(v1[perm]) * 0, jnp.asarray(lam2),
                jnp.asarray(f1[perm]), 1e-3, 1e6, sys2)
    assert np.allclose(np.asarray(g2), np.asarray(g1)[perm], atol=1e-8)
