"""One-off TPU probe: frozen coarse precond + VBD sweep cost at 10.6k elems."""
import os, time
os.environ.setdefault("TLFEA_NO_X64", "1")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tlfea_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from tlfea.constraints import FixedCoefs
    from tlfea.elements import feat10
    from tlfea.elements.assembly import lumped_mass
    from tlfea.materials import SVK, lame_from_E_nu
    from tlfea.ops import pallas_fem
    from tlfea.solvers import System, StepState, newton, vbd
    from tlfea.solvers.newton import _step
    from tlfea.solvers.coarse import build_coarse_precond
    from tlfea.utils.tetmesh import box_t10_mesh

    dtype = np.float32
    nodes, conn = box_t10_mesh(2.0, 0.35, 0.3, 42, 7, 6)
    lam, mu = lame_from_E_nu(1e7, 0.3)
    mat = SVK(lam=jnp.asarray(lam,dtype), mu=jnp.asarray(mu,dtype),
              eta_damp=jnp.asarray(1e3,dtype), lam_damp=jnp.asarray(1e3,dtype))
    fixed = np.nonzero(nodes[:,0] < 1e-12)[0]
    elems = feat10.build(nodes, conn, rho=1000.0, dtype=dtype)
    system0 = System(elems=elems, material=mat,
                     constraints=FixedCoefs.from_indices(fixed, nodes.astype(dtype)))
    system = pallas_fem.with_pallas(system0)
    state = StepState.rest(system, nodes.astype(dtype))
    f_ext = jnp.zeros((nodes.shape[0],3),dtype).at[:,2].add(lumped_mass(elems)*dtype(-9.81))
    fs = float(jnp.sqrt(jnp.sum(f_ext*f_ext)))
    params = newton.NewtonParams(dt=dtype(1e-3), rho=dtype(1e7),
        inner_atol=dtype(2.5e-2*fs), inner_rtol=dtype(0.0), outer_tol=dtype(0.0),
        max_outer=1, max_inner=4, cg_rtol=dtype(1e-3), cg_max_iter=50, ew_eta_max=dtype(0.5))

    def rollout(coarse, tag):
        @jax.jit
        def roll(s, f):
            def body(c, _):
                ns, d = _step(system, c, params, f, coarse)
                return ns, (d["newton_iters"], d["cg_iters"])
            return jax.lax.scan(body, s, None, length=20)
        s,(nit,cg) = roll(state, f_ext); jax.block_until_ready(s)
        t0=time.perf_counter(); s,(nit,cg)=roll(s,f_ext); jax.block_until_ready(s)
        w=(time.perf_counter()-t0)/20*1e3
        print(f"{tag:22s}: {w:6.2f} ms/step, newton {np.median(np.asarray(nit)):.0f}, cg {np.median(np.asarray(cg)):.0f}")

    rollout(None, "bj only")
    t0=time.perf_counter()
    cp = build_coarse_precond(system, nodes.astype(dtype), dtype(1e-3), dtype(1e7), rotations=True)
    print(f"build_coarse_precond: {time.perf_counter()-t0:.1f}s, na={cp.n_agg}")
    rollout(cp, "bj + frozen coarse")

    # VBD sweep cost
    vparams = vbd.VBDParams(dt=dtype(1e-3), rho=dtype(1e7), inner_tol=dtype(0.0),
                            max_outer=1, max_sweeps=8, color_group_size=4,
                            convergence_check_interval=100)
    vstep = vbd.make_step(system, vparams)
    s,d = vstep(state, f_ext); jax.block_until_ready(s)
    t0=time.perf_counter(); s,d = vstep(s, f_ext); jax.block_until_ready(s)
    w=(time.perf_counter()-t0)
    print(f"VBD: {w/int(d['sweeps'])*1e3:.1f} ms/sweep ({int(d['sweeps'])} sweeps, {w*1e3:.0f} ms total)")

main()
