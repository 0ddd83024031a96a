"""Gather/scatter implementation variants on TPU — the per-CG-iteration
floor is one gather + one scatter (PERF_NOTES), so their implementation
sets the Hv cost. Also times the two candidate coarse-correction applies
(segment-based vs dense-matmul) for the two-level preconditioner.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/micro_gs.py
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

    from tlfea.elements import feat10
    from tlfea.utils.tetmesh import box_t10_mesh

    dtype = np.float32
    nodes, conn_np = box_t10_mesh(2.0, 0.35, 0.3, 42, 7, 6)
    E, S = conn_np.shape
    n = nodes.shape[0]
    print(f"# E={E}, S={S}, n={n}, rows={E*S}, platform={jax.devices()[0].platform}")

    conn = jnp.asarray(conn_np.astype(np.int32))
    connf = jnp.asarray(conn_np.reshape(-1).astype(np.int32))
    conn3 = jnp.asarray(
        (conn_np.reshape(-1, 1) * 3 + np.arange(3)[None, :]).reshape(-1).astype(np.int32)
    )
    x0 = jnp.asarray(np.random.randn(n, 3).astype(dtype))
    key = jax.random.PRNGKey(0)

    def inloop(f, x, iters=30):
        @jax.jit
        def loop(a):
            return jax.lax.fori_loop(0, iters, lambda i, b: f(b), a)

        jax.block_until_ready(loop(x))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x))
        return (time.perf_counter() - t0) / iters * 1e3

    # ---------- gathers (x -> x shaped fns, reduce keeps data dependent)
    def g_rows(a):
        pe = a[conn]  # (E,S,3)
        return jnp.zeros_like(a).at[0].add(pe.sum(axis=(0, 1)))

    def g_flatrows(a):
        pe = a[connf]  # (E*S, 3)
        return jnp.zeros_like(a).at[0].add(pe.sum(axis=0))

    def g_flat1d(a):
        pe = a.reshape(-1)[conn3]  # (E*S*3,)
        return jnp.zeros_like(a).at[0, 0].add(pe.sum())

    def g_take(a):
        pe = jnp.take(a, connf, axis=0)
        return jnp.zeros_like(a).at[0].add(pe.sum(axis=0))

    x8 = jnp.zeros((n, 8), dtype)

    def g_pad8(a):
        a8 = jnp.pad(a, ((0, 0), (0, 5)))
        pe = a8[connf]
        return jnp.zeros_like(a).at[0].add(pe.sum(axis=0)[:3])

    def g_transposed(a):
        aT = a.T  # (3, n)
        pe = aT[:, connf]  # (3, E*S)
        return jnp.zeros_like(a).at[0].add(pe.sum(axis=1))

    print(f"gather rows (E,S):        {inloop(g_rows, x0):7.3f} ms")
    print(f"gather rows flat (E*S,):  {inloop(g_flatrows, x0):7.3f} ms")
    print(f"gather scalar 1d:         {inloop(g_flat1d, x0):7.3f} ms")
    print(f"gather jnp.take:          {inloop(g_take, x0):7.3f} ms")
    print(f"gather pad8 rows:         {inloop(g_pad8, x0):7.3f} ms")
    print(f"gather transposed lanes:  {inloop(g_transposed, x0):7.3f} ms")

    # ---------- row-count scaling
    for rows in (16_384, 65_536, 262_144, 1_048_576):
        idx = jnp.asarray((np.random.rand(rows) * n).astype(np.int32))

        def g_scale(a, idx=idx):
            pe = a[idx]
            return jnp.zeros_like(a).at[0].add(pe.sum(axis=0))

        print(f"gather {rows:8d} rows:     {inloop(g_scale, x0):7.3f} ms")

    # ---------- scatters
    vals = jnp.asarray(np.random.randn(E * S, 3).astype(dtype))

    def s_rows(a):
        out = jnp.zeros_like(a).at[connf].add(vals + a[:1])
        return out

    def s_flat1d(a):
        out = jnp.zeros((n * 3,), dtype).at[conn3].add((vals + a[:1]).reshape(-1))
        return out.reshape(n, 3)

    # sorted segment-sum (static permutation)
    order = np.argsort(conn_np.reshape(-1), kind="stable")
    order_d = jnp.asarray(order.astype(np.int32))
    seg_sorted = jnp.asarray(np.sort(conn_np.reshape(-1)).astype(np.int32))

    def s_segsorted(a):
        v = (vals + a[:1])[order_d]
        return jax.ops.segment_sum(v, seg_sorted, num_segments=n, indices_are_sorted=True)

    print(f"scatter rows:             {inloop(s_rows, x0):7.3f} ms")
    print(f"scatter scalar 1d:        {inloop(s_flat1d, x0):7.3f} ms")
    print(f"segment_sum sorted:       {inloop(s_segsorted, x0):7.3f} ms")

    # ---------- incidence-dual (gather instead of scatter)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, conn_np.reshape(-1), 1)
    D = int(deg.max())
    inc = np.zeros((n, D), np.int64)
    cnt = np.zeros(n, np.int64)
    for slot, node in enumerate(conn_np.reshape(-1)):
        inc[node, cnt[node]] = slot
        cnt[node] += 1
    # pad with a dummy slot pointing at a zero row
    incm = inc.copy()
    for i in range(n):
        incm[i, cnt[i]:] = E * S  # dummy
    inc_d = jnp.asarray(incm.astype(np.int32))
    vals_pad = jnp.concatenate([vals, jnp.zeros((1, 3), dtype)], axis=0)
    print(f"# incidence D={D}, gather rows={n*D}")

    def s_incidence(a):
        vp = jnp.concatenate([vals + a[:1], jnp.zeros((1, 3), dtype)], axis=0)
        g = vp[inc_d]  # (n, D, 3)
        return g.sum(axis=1)

    print(f"incidence-dual gather:    {inloop(s_incidence, x0):7.3f} ms")

    # ---------- coarse applies (two-level preconditioner)
    from tlfea.solvers.coarse import build_aggregates

    setup = build_aggregates(nodes, target_cluster=48)
    na = setup.n_agg
    agg = setup.agg
    print(f"# aggregates: {na}")

    def seg_apply(r):
        rc = jnp.zeros((na, 3), dtype).at[agg].add(r)  # R^T r
        return r + rc[agg]  # + R zc (skip solve)

    Wd = np.zeros((na, n), dtype)
    Wd[np.asarray(agg), np.arange(n)] = 1.0
    Wd = jnp.asarray(Wd)

    def mm_apply(r):
        rc = Wd @ r  # (na, 3)
        return r + Wd.T @ rc

    print(f"coarse apply (segment):   {inloop(seg_apply, x0):7.3f} ms")
    print(f"coarse apply (matmul):    {inloop(mm_apply, x0):7.3f} ms")

    # block-jacobi apply for context
    from tlfea.ops.linalg import solve3x3

    blocks = jnp.asarray(
        np.tile(np.eye(3, dtype=dtype) * 2.0, (n, 1, 1))
        + 0.1 * np.random.rand(n, 3, 3).astype(dtype)
    )

    def bj_apply(r):
        return solve3x3(blocks, r, eps=1e-30)

    print(f"block-jacobi solve3x3:    {inloop(bj_apply, x0):7.3f} ms")

    # dot products (CG overhead)
    def dots(r):
        return r * (jnp.sum(r * r) + 1.0)

    print(f"dot+scale:                {inloop(dots, x0):7.3f} ms")


if __name__ == "__main__":
    main()
