"""Per-phase TPU microbenchmarks for the implicit-step hot path.

Measures steady-state in-loop cost (lax.fori_loop inside one jit, so no
dispatch overhead) of each phase of a Newton-PCG step at bench scale
(10,584 T10 elements): gradient, linearized Hv, preconditioner blocks,
raw gather/scatter, layout transposes, bare Pallas kernels.

Usage: python benchmarks/micro.py [--elems small|bench|big]
Feeds PERF_NOTES.md; not part of the test suite.
"""

import os
import time

os.environ.setdefault("TLFEA_NO_X64", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tlfea_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tlfea.constraints import FixedCoefs
    from tlfea.elements import feat10
    from tlfea.elements.assembly import lumped_mass
    from tlfea.materials import SVK, lame_from_E_nu
    from tlfea.ops import pallas_fem
    from tlfea.solvers import System, StepState, newton
    from tlfea.solvers.common import grad_L, precond_blocks
    from tlfea.utils.tetmesh import box_t10_mesh

    dtype = np.float32
    nodes, conn = box_t10_mesh(2.0, 0.35, 0.3, 42, 7, 6)
    n_elem = conn.shape[0]
    print(f"# {n_elem} elements, {nodes.shape[0]} nodes, {jax.devices()[0].platform}")

    lam, mu = lame_from_E_nu(1e7, 0.3)
    mat = SVK(lam=jnp.asarray(lam, dtype), mu=jnp.asarray(mu, dtype),
              eta_damp=jnp.asarray(1e3, dtype), lam_damp=jnp.asarray(1e3, dtype))
    fixed = np.nonzero(nodes[:, 0] < 1e-12)[0]
    elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
    cons = FixedCoefs.from_indices(fixed, nodes.astype(dtype))
    system = pallas_fem.with_pallas(
        System(elems=elems, material=mat, constraints=cons))
    state = StepState.rest(system, nodes.astype(dtype))
    f_ext = jnp.zeros((nodes.shape[0], 3), dtype).at[:, 2].add(
        lumped_mass(elems) * dtype(-9.81))
    dt = dtype(1e-3)
    rho = dtype(1e7)

    key = jax.random.PRNGKey(0)
    v = 1e-3 * jax.random.normal(key, state.x.shape, dtype)

    def inloop(f, x0, iters=30):
        """Steady-state per-call ms of x -> f(x) (x and f(x) same pytree)."""
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, iters, lambda i, a: f(a), x)

        jax.block_until_ready(loop(x0))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        return (time.perf_counter() - t0) / iters * 1e3

    # ---- full gradient (pallas fused path, folded constraints)
    def g_of(v):
        return grad_L(v, state.x, state.v, state.lam, f_ext, dt, rho, system)

    print(f"grad_L (pallas, fused cons):   {inloop(g_of, v):7.3f} ms")

    # ---- linearized Hv
    _, hvp = jax.linearize(g_of, v)

    def hv_loop(p):
        return hvp(p)

    @jax.jit
    def hv_steady(p):
        def body(i, a):
            _, h = jax.linearize(g_of, v)
            return h(a)
        return jax.lax.fori_loop(0, 1, body, p)

    # measure hvp in-loop: linearize once outside the loop via closure trick
    @jax.jit
    def hv_inloop(p):
        gg, h = jax.linearize(g_of, v)
        return jax.lax.fori_loop(0, 30, lambda i, a: h(a), p) + 0 * gg

    jax.block_until_ready(hv_inloop(v))
    t0 = time.perf_counter()
    jax.block_until_ready(hv_inloop(v))
    print(f"Hv (linearized, in-loop):      {(time.perf_counter()-t0)/30*1e3:7.3f} ms")

    # ---- preconditioner blocks (pallas kernel path)
    def pb(vv):
        b = precond_blocks(vv, state.x, dt, rho, system)
        return vv + 1e-30 * b[:, 0, 0:3]

    print(f"precond_blocks (pallas):       {inloop(pb, v):7.3f} ms")

    # ---- raw gather / scatter / transpose costs
    connd = elems.conn
    n = nodes.shape[0]
    packed9 = jnp.concatenate([v, v, v], axis=1)

    def gth3(a):
        return a[connd].sum(axis=(1,)) * 0 + a[:0] if False else a

    def gather3(a):  # (n,3) -> (n,3) keeping shape via reduce
        pe = a[connd]            # (E,S,3)
        return a.at[0, 0].add(pe[0, 0, 0] * 0) if False else a * 0 + a

    # Simpler: measure as x -> scatter(gather(x)) pairs and components.
    def gather_only(a):
        pe = a[connd]  # (E,S,3)
        # fold back to (n,3) with a cheap reduction that XLA can't elide
        return jnp.zeros_like(a).at[0].add(pe.sum(axis=(0, 1)))

    def gather_scatter(a):
        pe = a[connd]
        return jnp.zeros_like(a).at[connd.reshape(-1)].add(pe.reshape(-1, 3))

    def gather9_only(a):
        p9 = jnp.concatenate([a, a, a], axis=1)
        pe = p9[connd]  # (E,S,9)
        return jnp.zeros_like(a).at[0].add(pe.sum(axis=(0, 1))[:3])

    def gather_tp(a):
        S = connd.shape[1]
        E = connd.shape[0]
        p9 = jnp.concatenate([a, a, a], axis=1)
        pe = p9[connd]
        peT = jnp.transpose(pe, (1, 2, 0)).reshape(S * 9, E)
        return jnp.zeros_like(a).at[0, 0].add(peT.sum() * 1e-30)

    print(f"gather (E,S,3):                {inloop(gather_only, v):7.3f} ms")
    print(f"gather+scatter (E,S,3):        {inloop(gather_scatter, v):7.3f} ms")
    print(f"gather (E,S,9):                {inloop(gather9_only, v):7.3f} ms")
    print(f"gather9 + transpose to tiles:  {inloop(gather_tp, v):7.3f} ms")

    # ---- bare pallas kernels on resident tiles
    h = system.pallas
    S, E, E_pad = h.S, h.E, h.E_pad
    LANE = pallas_fem.LANE
    peT = jnp.zeros((S * 9, E_pad // LANE, LANE), dtype)

    def kern_primal(a):
        return h.fn(a)[: S * 9] * 0 + a if False else a

    @jax.jit
    def kern_loop(a):
        def body(i, acc):
            out = h.fn(acc)  # (S*3, B, L)
            return acc.at[: S * 3].add(out * 1e-30)
        return jax.lax.fori_loop(0, 30, body, a)

    jax.block_until_ready(kern_loop(peT))
    t0 = time.perf_counter()
    jax.block_until_ready(kern_loop(peT))
    print(f"pallas primal kernel:          {(time.perf_counter()-t0)/30*1e3:7.3f} ms")

    # full newton step for context
    params = newton.NewtonParams(
        dt=dt, rho=rho, inner_atol=dtype(2.5e-2 * float(jnp.linalg.norm(f_ext))),
        inner_rtol=dtype(0.0), outer_tol=dtype(0.0), max_outer=1, max_inner=3,
        cg_rtol=dtype(1e-3), cg_max_iter=50, ew_eta_max=dtype(0.5))
    step = newton.make_step(system, params)
    s, d = step(state, f_ext)
    jax.block_until_ready(s)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s, d = step(s, f_ext)
        jax.block_until_ready(s)
        times.append(time.perf_counter() - t0)
    print(f"full step p50:                 {np.median(times)*1e3:7.3f} ms  "
          f"(newton {int(d['newton_iters'])}, cg {int(d['cg_iters'])})")


if __name__ == "__main__":
    main()
