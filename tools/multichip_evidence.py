#!/usr/bin/env python
"""Multi-chip scaling evidence: agreement + collective counts per path.

Runs the four sharded execution paths (z-slab psum, halo ppermute,
sharded banded, sharded block-DIA — fenris_tpu/parallel/) on 1/2/4/8
virtual CPU devices,
records (a) max-abs agreement of residual and Hessian-action against the
serial model and (b) the number of XLA collectives in each compiled step
(from the compiled HLO), quantifying the "one collective per sweep"
communication design.  Writes artifacts/multichip_r3.json.

Usage:  python tools/multichip_evidence.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def count_collectives(compiled_text: str) -> dict:
    return {
        "all_reduce": compiled_text.count("all-reduce"),
        "collective_permute": compiled_text.count("collective-permute"),
        "all_gather": compiled_text.count("all-gather"),
        "reduce_scatter": compiled_text.count("reduce-scatter"),
    }


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.parallel import make_device_mesh
    from fenris_tpu.parallel.banded import ShardedBandedElasticity
    from fenris_tpu.parallel.halo import StructuredHaloElasticity
    from fenris_tpu.parallel.structured import StructuredShardedElasticity
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
    from fenris_tpu.structured import StructuredHyperelasticModel

    rng = np.random.default_rng(0)
    out = {"devices_available": len(jax.devices()), "paths": {}}

    # serial references
    cells = (6, 5, 16)
    ncx, ncy, ncz = cells
    nodes = (ncx + 1) * (ncy + 1) * (ncz + 1)
    mask = np.zeros(nodes * 3, dtype=bool)
    mask[: (ncy + 1) * (ncx + 1) * 3] = True
    smodel = StructuredHyperelasticModel(
        cells=cells,
        spacing=0.1,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.614, lam=576.923),
        dirichlet_mask=mask,
        body_force=np.array([0.0, 0.0, -2.0]),
        dtype=jnp.float64,
    )
    u = jnp.asarray(rng.uniform(-0.01, 0.01, smodel.num_dofs))
    v = jnp.asarray(rng.standard_normal(smodel.num_dofs))
    r_ref = np.asarray(smodel.residual(u))
    h_ref = np.asarray(smodel.hessian_vector_product(u, v))

    umesh = create_unit_box_uniform_hex_mesh_3d(8)
    umodel = HyperelasticModel(
        mesh=umesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.614, lam=576.923),
        dirichlet_nodes=np.arange(81),
        banded=True,
        banded_r_nodes=1024,
    )
    uu = jnp.asarray(rng.uniform(-0.01, 0.01, umodel.space.num_dofs))
    uv = jnp.asarray(rng.standard_normal(umodel.space.num_dofs))
    ur_ref = np.asarray(umodel.residual(uu))
    uh_ref = np.asarray(umodel.hessian_vector_product(uu, uv))

    # assembled block-DIA serial reference (res 10: 11^3 nodes keeps the
    # per-device chunk >= the one-node-plane halo at 8 devices)
    from fenris_tpu.parallel.block_dia import ShardedBlockDia

    dmesh_m = create_unit_box_uniform_hex_mesh_3d(10)
    dmodel = HyperelasticModel(
        mesh=dmesh_m,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.614, lam=576.923),
        dirichlet_nodes=np.arange(121),
    )
    du = jnp.asarray(rng.uniform(-0.01, 0.01, dmodel.space.num_dofs))
    dv = jnp.asarray(rng.standard_normal(dmodel.space.num_dofs))
    dmat = dmodel.assemble_hessian_block_dia(du)
    dy_ref = np.asarray(dmat @ dv)

    for n in (1, 2, 4, 8):
        mesh = make_device_mesh(n)
        row = {}

        sharded = StructuredShardedElasticity(smodel, mesh)
        f = jax.jit(sharded.residual)
        hv = jax.jit(sharded.hessian_vector_product)
        row["zslab_psum"] = {
            "residual_max_abs_diff": float(np.abs(np.asarray(f(u)) - r_ref).max()),
            "hvp_max_abs_diff": float(np.abs(np.asarray(hv(u, v)) - h_ref).max()),
            "collectives_residual": count_collectives(
                f.lower(u).compile().as_text()
            ),
            "collectives_hvp": count_collectives(hv.lower(u, v).compile().as_text()),
        }

        halo = StructuredHaloElasticity(smodel, mesh)
        ug = halo.to_grid(u)
        vg = halo.to_grid(v)
        fh = jax.jit(halo.residual)
        hh = jax.jit(halo.hessian_vector_product)
        row["halo_ppermute"] = {
            "residual_max_abs_diff": float(
                np.abs(np.asarray(halo.to_flat(fh(ug))) - r_ref).max()
            ),
            "hvp_max_abs_diff": float(
                np.abs(np.asarray(halo.to_flat(hh(ug, vg))) - h_ref).max()
            ),
            "collectives_residual": count_collectives(
                fh.lower(ug).compile().as_text()
            ),
            "collectives_hvp": count_collectives(hh.lower(ug, vg).compile().as_text()),
        }

        sb = ShardedBandedElasticity(umodel, mesh)
        fb = jax.jit(sb.residual)
        hb = jax.jit(sb.hessian_vector_product)
        row["sharded_banded"] = {
            "residual_max_abs_diff": float(np.abs(np.asarray(fb(uu)) - ur_ref).max()),
            "hvp_max_abs_diff": float(np.abs(np.asarray(hb(uu, uv)) - uh_ref).max()),
            "collectives_residual": count_collectives(
                fb.lower(uu).compile().as_text()
            ),
            "collectives_hvp": count_collectives(hb.lower(uu, uv).compile().as_text()),
        }
        sd = ShardedBlockDia(dmat, mesh)
        fd = jax.jit(sd.matvec)
        dvb = sd.to_sharded(dv)
        row["sharded_block_dia"] = {
            "matvec_max_abs_diff": float(
                np.abs(np.asarray(sd.to_flat(fd(dvb))) - dy_ref).max()
            ),
            "collectives_matvec": count_collectives(
                fd.lower(dvb).compile().as_text()
            ),
        }
        out["paths"][str(n)] = row
        print(json.dumps({n: row}), flush=True)

    path = Path(__file__).resolve().parent.parent / "artifacts" / "multichip_r3.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
