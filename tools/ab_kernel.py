"""On-chip A/B of renderer variants: forward render and true-gradient cost.

Times, at bench scale, (a) the jitted forward render alone and (b)
value_and_grad of the photometric loss with ALL per-Gaussian gradients
consumed through mask_rows (the consumption bisect_body.py showed is what
forces the real backward — a tree_sum consumer lets XLA DCE most of it).

Run twice with env toggles to A/B a change, e.g.:
    R3DGS_ALIGN=0 python tools/ab_kernel.py
    R3DGS_ALIGN=1 python tools/ab_kernel.py

Prints one JSON line {"fwd_ms": .., "grad_ms": .., "num_rendered": ..}.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from reduced_3dgs_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from tools.bisect_body import build, time_chained  # noqa: E402
from reduced_3dgs_tpu.dataset import CameraDataset  # noqa: E402
from reduced_3dgs_tpu.trainer import Trainer  # noqa: E402
import reduced_3dgs_tpu.trainer.functional as F  # noqa: E402
from reduced_3dgs_tpu.ops.rasterize import pallas_kernel as pk  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warm", type=int, default=130)
    args_cli = ap.parse_args()

    model, cam = build()
    ds = CameraDataset([cam])
    trainer = Trainer(model, ds)
    trainer.model.active_sh_degree = 3
    for _ in range(args_cli.warm):
        loss, out = trainer.step(cam)
    jax.block_until_ready(out["render"])
    K = trainer.key_buffer_for(cam)
    K = -(-K // pk.CHUNK) * pk.CHUNK

    params = trainer.model.parameters()
    aux = trainer.model.aux_state()
    n_alive = trainer.n_alive
    loss_fn = trainer.loss_pure()

    def render_of(p, carry):
        p = dict(p)
        p["xyz"] = p["xyz"] + carry * 1e-30
        c = p["xyz"].shape[0]
        alive = F.alive_mask(c, n_alive)
        offset0 = jnp.zeros((c, 2), jnp.float32)

        def lf(diff):
            pp, off = diff
            out = model.render(pp, cam, aux=aux, alive=alive,
                               mean2d_offset_ndc=off, key_buffer_size=K)
            return loss_fn(pp, aux, out, cam, {}), out

        return lf, (p, offset0), alive

    def v_fwd(carry, p):
        lf, diff, _ = render_of(p, carry)
        loss, out = lf(diff)
        return carry + loss * 0 + jnp.sum(out["render"]) * 0

    def v_grad(carry, p):
        lf, diff, alive = render_of(p, carry)
        (loss, out), grads = jax.value_and_grad(lf, has_aux=True)(diff)
        gparams, goff = grads
        gparams = F.mask_rows(gparams, alive)
        acc = jnp.where((out["radii"] > 0) & alive,
                        jnp.linalg.norm(goff, axis=-1), 0.0)
        leaves = [jnp.sum(x) for x in gparams.values()] + [jnp.sum(acc)]
        return carry + loss * 0 + sum(leaves) * 0 + jnp.sum(out["render"]) * 0

    fwd_ms = time_chained(jax.jit(v_fwd), (params,), args_cli.steps)
    grad_ms = time_chained(jax.jit(v_grad), (params,), args_cli.steps)
    # one eager render for num_rendered
    out = model.render(params, cam, aux=aux,
                       alive=F.alive_mask(params["xyz"].shape[0], n_alive),
                       key_buffer_size=K)
    res = {"fwd_ms": round(fwd_ms, 3), "grad_ms": round(grad_ms, 3),
           "num_rendered": int(out["num_rendered"]), "K": K,
           "align": os.environ.get("R3DGS_ALIGN", "1"),
           "chunk": pk.CHUNK,
           "device": str(jax.devices()[0])}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
