"""SH evaluation vs the reference polynomial formulas."""

import numpy as np
import jax
import jax.numpy as jnp

from reduced3dgs_tpu.ops import sh as sh_ops

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396]
C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435]


def eval_sh_reference(deg, sh, dirs):
    """Direct transcription of utils/sh_utils.py:62-112 in numpy."""
    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + C2[0] * xy * sh[..., 4] + C2[1] * yz * sh[..., 5]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + C2[3] * xz * sh[..., 7] + C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result
                          + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + C3[1] * xy * z * sh[..., 10]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + C3[5] * z * (xx - yy) * sh[..., 14]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
    return result


def _random_inputs(n=64, seed=0):
    rng = np.random.default_rng(seed)
    sh = rng.normal(size=(n, 16, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return sh.astype(np.float32), dirs.astype(np.float32)


def test_eval_sh_color_all_degrees():
    sh, dirs = _random_inputs()
    for deg in range(4):
        degrees = jnp.full((sh.shape[0],), deg, jnp.int32)
        ours = np.asarray(sh_ops.eval_sh_color(jnp.array(sh), jnp.array(dirs), degrees))
        # reference evaluates sh as (..., C, coeffs): transpose
        golden = eval_sh_reference(deg, np.swapaxes(sh, 1, 2), dirs)
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_mixed_degrees():
    sh, dirs = _random_inputs(seed=1)
    degrees = jnp.array(np.arange(64) % 4, jnp.int32)
    ours = np.asarray(sh_ops.eval_sh_color(jnp.array(sh), jnp.array(dirs), degrees))
    for i in range(64):
        golden = eval_sh_reference(i % 4, np.swapaxes(sh[i:i+1], 1, 2), dirs[i:i+1])
        np.testing.assert_allclose(ours[i], golden[0], rtol=1e-4, atol=1e-5)


def test_clamp_gradient_is_zero():
    """Clamped channels must get zero SH gradient (backward.cu:30-34)."""
    sh, dirs = _random_inputs(n=4, seed=2)
    sh = sh * 0  # color = 0.5 everywhere
    sh[:, 0, 0] = -10.0  # red channel strongly negative -> clamped
    degrees = jnp.zeros((4,), jnp.int32)

    def f(s):
        return sh_ops.eval_sh_color_clamped(s, jnp.array(dirs), degrees).sum()

    g = np.asarray(jax.grad(f)(jnp.array(sh)))
    assert np.all(g[:, 0, 0] == 0.0)  # clamped channel
    assert np.all(g[:, 0, 1] > 0.0)  # unclamped channels flow


def test_rgb_sh_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(
        np.asarray(sh_ops.sh_to_rgb(sh_ops.rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6
    )


def test_per_degree_colors():
    sh, dirs = _random_inputs(n=16, seed=3)
    degrees = jnp.full((16,), 3, jnp.int32)
    out = np.asarray(
        sh_ops.eval_sh_color_per_degree(jnp.array(sh), jnp.array(dirs), degrees)
    )
    assert out.shape == (16, 4, 3)
    for d in range(4):
        golden = eval_sh_reference(d, np.swapaxes(sh, 1, 2), dirs) + 0.5
        np.testing.assert_allclose(out[:, d], np.maximum(golden, 0), rtol=1e-4, atol=1e-5)
    # degree-limited primitives keep zeros above their degree
    degrees2 = jnp.full((16,), 1, jnp.int32)
    out2 = np.asarray(
        sh_ops.eval_sh_color_per_degree(jnp.array(sh), jnp.array(dirs), degrees2)
    )
    assert np.all(out2[:, 2:] == 0.0)


def test_ragged_variable_sh_matches_dense():
    """models/variable_sh.py: degree-grouped packed SH evaluation must
    reproduce the dense masked path exactly (the reference's ragged
    inference buffer is bit-identical to its dense training path for
    the same degrees, forward.cu:246-350)."""
    import jax
    import jax.numpy as jnp

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.models import gaussians as G
    from reduced3dgs_tpu.models.variable_sh import build_ragged, eval_colors
    from reduced3dgs_tpu.renderer import render

    rng = np.random.default_rng(5)
    n = 120
    pool = G.create_from_pcd(
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        rng.uniform(0, 1, (n, 3)).astype(np.float32), capacity=160)
    feats_rest = rng.normal(0, 0.3, (160, 15, 3)).astype(np.float32)
    pool = pool._replace(
        params=pool.params._replace(features_rest=jnp.asarray(feats_rest)),
        degrees=jnp.asarray(rng.integers(0, 4, 160).astype(np.int32)),
    )

    cam = Camera.look_at(eye=(0, 0, -3), target=(0, 0, 0),
                         width=64, height=48)
    bg = jnp.zeros(3)

    def full(pool, color_precomp=None, feats=None):
        f = pool.features() if feats is None else feats
        return render(
            pool.params.xyz, f, pool.params.scaling,
            pool.params.rotation, pool.params.opacity[:, 0], pool.degrees,
            cam.params(), bg, width=64, height=48, instance_budget=4096,
            alive_mask=pool.alive, color_precomp=color_precomp)

    dense = full(pool)
    pool_r, ragged = build_ragged(pool)
    colors = eval_colors(ragged, pool_r.params.xyz, cam.params().campos)
    dummy = jnp.zeros((pool_r.params.xyz.shape[0], 1, 3), jnp.float32)
    rag = full(pool_r, color_precomp=colors, feats=dummy)
    np.testing.assert_allclose(np.asarray(rag.color),
                               np.asarray(dense.color), atol=2e-5)
    # memory contract: packed blocks store only (d+1)^2 coefficients
    for d, blk in enumerate(ragged.blocks):
        assert blk.shape[1] == (d + 1) ** 2
