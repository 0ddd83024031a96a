"""Collision pipeline cost at the item-drop scale (dragon + floor, 14.5k
elems), in-scan per-step: dense cross broadphase (round-2 production) vs the
two-level block broadphase (round 3), at a configuration with real contact.

Reference envelope: the CUDA pipeline runs broadphase+narrowphase in a few
sub-ms kernels (`HydroelasticBroadphase.cu:568-660`,
`HydroelasticNarrowphaseFunc.cuh:472-638`); round-2 measured ~90 ms/step
here — the dense 3.1M-pair candidate list and its argsort compaction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TLFEA_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tlfea_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tlfea.collision.broadphase import (
    compact_pairs, find_pairs_block, find_pairs_dense, setup_block_cross,
    setup_broadphase, setup_dense_cross,
)
from tlfea.collision.forces import patch_forces
from tlfea.collision.narrowphase import compute_patches
from tlfea.utils.mesh_manager import MeshManager
from tlfea.utils.pressure import distance_pressure_field
from tlfea.utils.tetmesh import box_t10_mesh

REF = "/root/reference/data/meshes/T10"
mm = MeshManager()
item = mm.load_mesh(os.path.join(REF, "item_drop/dragon.node"),
                    os.path.join(REF, "item_drop/dragon.ele"), "dragon")
inodes = mm.mesh_nodes(item)
ext = inodes.max(axis=0) - inodes.min(axis=0)
fn, fc = box_t10_mesh(2.5 * ext[0], 2.5 * ext[1], 0.2 * ext[2], 6, 6, 1)
floor = mm.add_mesh(fn, fc, "floor")
# Floor top slightly ABOVE the dragon's feet -> real interpenetration.
mm.translate_mesh(floor, (inodes[:, 0].min() - 0.75 * ext[0],
                          inodes[:, 1].min() - 0.75 * ext[1],
                          inodes[:, 2].min() - 0.2 * ext[2] + 0.02 * ext[2]))
for mid in (item, floor):
    inst = mm.instances[mid]
    local = mm.elements[inst.elem_offset:inst.elem_offset + inst.n_elems] - inst.node_offset
    mm.set_scalar_field(mid, distance_pressure_field(mm.mesh_nodes(mid), local, 1e6))
sc = mm.scene()

dtype = np.float32
x0 = jnp.asarray(sc.nodes, dtype)
v0 = jnp.zeros_like(x0)
press = jnp.asarray(sc.pressures, dtype)
print(f"scene: {sc.conn.shape[0]} elems, {sc.nodes.shape[0]} nodes")

bp = setup_broadphase(sc.conn, sc.elem_mesh_ids, window=256, margin=0.0)
cross = setup_dense_cross(sc.conn, sc.elem_mesh_ids)
blk = setup_block_cross(sc.conn, sc.elem_mesh_ids, sc.nodes, block=64,
                        block_pair_cap=512)
print(f"dense cross pairs: {cross.shape[0]}; block pairs: {blk.block_pairs.shape[0]}"
      f" (nb={blk.n_blocks}, B={blk.block})")

MAX_PAIRS = 8192
N = 30


def timeit_scan(name, phase_fn):
    @jax.jit
    def run(x):
        def body(carry, _):
            x = carry
            f = phase_fn(x)
            x = x + 1e-12 * f
            return x, jnp.sum(f)
        xf, s = jax.lax.scan(body, x, None, length=N)
        return xf, s

    out = run(x0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(x0); jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:44s} {ms:8.3f} ms/step")
    return ms


def make_full(find, max_pairs):
    def full(x):
        pairs, valid, _ = find(x)
        pairs, valid, _ = compact_pairs(pairs, valid, max_pairs)
        patches = compute_patches(x, press, bp.corners, pairs, valid, bp.mesh_ids, False)
        return patch_forces(patches, x, v0, bp.corners,
                            damping=dtype(0.0), friction=dtype(0.3))
    return full


def make_broad(find, max_pairs):
    def broad(x):
        pairs, valid, _ = find(x)
        pairs, valid, _ = compact_pairs(pairs, valid, max_pairs)
        return jnp.zeros_like(x) + valid.sum() * 0.0
    return broad


dense_find = lambda x: find_pairs_dense(bp, x, cross)
block_find = lambda x: find_pairs_block(bp, blk, x)

# work content
pairs, valid, _ = block_find(x0)
pairs_c, valid_c, ovf = compact_pairs(pairs, valid, MAX_PAIRS)
patches = compute_patches(x0, press, bp.corners, pairs_c, valid_c, bp.mesh_ids, False)
print(f"active candidates: {int(valid.sum())}, contacts: {int(patches.n_contacts)}, overflow: {bool(ovf)}")

timeit_scan("dense broadphase only", make_broad(dense_find, MAX_PAIRS))
timeit_scan("block broadphase only", make_broad(block_find, MAX_PAIRS))
timeit_scan("full dense, max_pairs=8192", make_full(dense_find, MAX_PAIRS))
timeit_scan("full block, max_pairs=8192", make_full(block_find, MAX_PAIRS))
timeit_scan("full block, max_pairs=4096", make_full(block_find, 4096))
timeit_scan("full block, max_pairs=2048", make_full(block_find, 2048))
