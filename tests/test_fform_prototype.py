"""Device solvers vs the standalone NumPy f-form prototype.

The reference's correctness strategy rests on NumPy prototypes as executable
specs (`test-scripts/T10-tets/f-form-*`, SURVEY §4); this is the same
strategy applied to the JAX implementation: identical gradients, identical
implicit steps.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "prototypes"))

import jax.numpy as jnp

from fform_t10 import FFormT10
from tlfea.constraints import FixedCoefs
from tlfea.elements import feat10
from tlfea.materials import SVK, lame_from_E_nu
from tlfea.solvers import System, StepState, newton
from tlfea.solvers.common import grad_L
from tlfea.utils.tetmesh import box_t10_mesh


def setup(mass_rule="exact"):
    nodes, conn = box_t10_mesh(0.4, 0.2, 0.2, 1, 1, 1)
    lam, mu = lame_from_E_nu(1e6, 0.3)
    dt, rho_alm = 1e-3, 1e6
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    mat = SVK(lam=lam, mu=mu)
    elems = feat10.build(nodes, conn, rho=1000.0, mass_rule=mass_rule)
    system = System(
        elems=elems, material=mat, constraints=FixedCoefs.from_indices(fixed, nodes)
    )
    # Prototype and device share the mass operator; mass assembly itself is
    # validated separately against golden files / dense oracles. (The keast5
    # parity mass is indefinite — fine for gradient comparison, unusable for
    # CG-based stepping.)
    n = nodes.shape[0]
    M = np.zeros((n, n))
    me = np.asarray(elems.mass_elem)
    cc = np.asarray(elems.conn)
    for e in range(cc.shape[0]):
        M[np.ix_(cc[e], cc[e])] += me[e]
    proto = FFormT10(nodes, conn, 1000.0, lam, mu, dt, rho_alm, fixed=fixed, mass_matrix=M)
    return nodes, conn, proto, system, dt, rho_alm, fixed


def test_alm_gradient_matches_prototype():
    nodes, conn, proto, system, dt, rho_alm, fixed = setup(mass_rule="keast5")
    rng = np.random.default_rng(11)
    v = rng.standard_normal(nodes.shape) * 0.1
    v_prev = rng.standard_normal(nodes.shape) * 0.1
    lam_dual = rng.standard_normal((len(fixed), 3))
    f_ext = rng.standard_normal(nodes.shape)

    g_dev = np.asarray(
        grad_L(
            jnp.asarray(v), jnp.asarray(nodes), jnp.asarray(v_prev),
            jnp.asarray(lam_dual), jnp.asarray(f_ext), dt, rho_alm, system,
        )
    )
    g_ref = proto.grad(v, nodes, v_prev, lam_dual, f_ext)
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_dev, g_ref, rtol=1e-10, atol=1e-12 * scale)


def test_full_step_matches_dense_newton_prototype():
    nodes, conn, proto, system, dt, rho_alm, fixed = setup()
    f_ext = np.zeros_like(nodes)
    f_ext[:, 2] = -5.0

    x_ref, v_ref, _ = proto.step_newton_dense(
        nodes.copy(), np.zeros_like(nodes), np.zeros((len(fixed), 3)), f_ext, iters=12
    )

    params = newton.NewtonParams(
        dt=dt, rho=rho_alm, inner_atol=1e-12, max_outer=1, max_inner=15,
        cg_rtol=1e-10, cg_max_iter=500,
    )
    state = StepState.rest(system, nodes)
    state, _ = newton.step(system, state, params, jnp.asarray(f_ext))

    scale = np.abs(x_ref - nodes).max() + 1e-30
    dev = np.abs(np.asarray(state.x) - x_ref).max() / scale
    assert dev < 1e-4, f"implicit step deviates {dev:.2e} from dense-Newton prototype"
