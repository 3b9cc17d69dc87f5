"""Child process for test_tpu_parity: run the compiled (non-interpret)
Pallas kernels on the real TPU chip and print parity metrics as JSON.

Run by tests/test_tpu_parity.py in a subprocess WITHOUT the conftest CPU
pin, so jax picks the hardware backend the environment registers.  The
reference's equivalent coverage is implicit (its CUDA kernels always run
on device, cuda_rasterizer/auxiliary.h:161-168); on TPU the Mosaic
compile path is only exercised when interpret=False on a real chip, so
this child is the regression gate for hardware compilability.
"""

import json
import sys


def main():
    import jax
    import jax.numpy as jnp

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.renderer import render
    from tests.test_tile_render import BUDGET, H, W, make_scene

    backend = jax.default_backend()
    cam = Camera.look_at(eye=(0, 0, -3.2), target=(0, 0, 0),
                         width=W, height=H)
    (xyz, feats, scales, rots, opac, degrees), cp = make_scene(), cam.params()
    bg = jnp.array([0.2, 0.1, 0.4])
    target = jnp.zeros((H, W, 3))

    def run(backend_name, want_transmittance=False):
        return render(xyz, feats, scales, rots, opac, degrees, cp, bg,
                      width=W, height=H, instance_budget=BUDGET,
                      backend=backend_name,
                      want_transmittance=want_transmittance)

    pal = run("pallas", want_transmittance=True)
    ref = run("xla", want_transmittance=True)

    def loss(backend_name, *params):
        out = render(*params, degrees, cp, bg, width=W, height=H,
                     instance_budget=BUDGET, backend=backend_name)
        return jnp.abs(out.color - target).mean() + 0.1 * out.final_t.mean()

    args = (xyz, feats, scales, rots, opac)
    g_pal = jax.grad(lambda *a: loss("pallas", *a),
                     argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(lambda *a: loss("xla", *a),
                     argnums=(0, 1, 2, 3, 4))(*args)

    grad_rel = []
    for gp, gr in zip(g_pal, g_ref):
        d = float(jnp.abs(gp - gr).max())
        m = float(jnp.abs(gr).max())
        grad_rel.append(d / max(m, 1e-12))

    print(json.dumps({
        "backend": backend,
        "num_rendered": int(pal.num_rendered),
        "color_max_diff": float(jnp.abs(pal.color - ref.color).max()),
        "final_t_max_diff": float(jnp.abs(pal.final_t - ref.final_t).max()),
        "trans_max_diff": float(
            jnp.abs(pal.transmittance_sum - ref.transmittance_sum).max()),
        "touched_max_diff": int(
            jnp.abs(pal.pixels_touched - ref.pixels_touched).max()),
        "grad_max_rel": max(grad_rel),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 - report to parent for skip/fail
        print(json.dumps({"error": f"{type(e).__name__}: {e}"}))
        sys.exit(1)
