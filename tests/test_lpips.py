"""LPIPS (ops/lpips.py) exercised end-to-end with small random weights.

The real VGG16 weights cannot be downloaded in this environment
(reference lpipsPyTorch/modules/lpips.py:8-36 downloads at runtime), so
the .npz loading + conv stack + unit-normalize + linear-head pipeline is
driven with random weights of the correct shapes — the code path CI
could never reach while weights were environment-gated (VERDICT round 3
item 8).
"""

import numpy as np
import pytest

from reduced3dgs_tpu.ops import lpips as L


def _random_weights(tmp_path, seed=0):
    rng = np.random.default_rng(seed)
    arrays = {}
    cin = 3
    ci = 0
    tap_channels = []
    for spec in L._VGG_CFG:
        if spec == "M":
            continue
        arrays[f"conv{ci}_weight"] = rng.normal(
            0, 0.05, (spec, cin, 3, 3)).astype(np.float32)
        arrays[f"conv{ci}_bias"] = rng.normal(
            0, 0.01, (spec,)).astype(np.float32)
        if ci in L._TAPS:
            tap_channels.append(spec)
        cin = spec
        ci += 1
    for k, c in enumerate(tap_channels):
        # lpips heads are non-negative 1x1 convs (1, C, 1, 1)
        arrays[f"lin{k}_weight"] = rng.uniform(
            0, 0.1, (1, c, 1, 1)).astype(np.float32)
    path = tmp_path / "lpips_rand.npz"
    np.savez(path, **arrays)
    return str(path)


def test_lpips_runs_with_npz(tmp_path):
    path = _random_weights(tmp_path)
    fn = L.lpips_fn(path)
    assert fn is not None
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    d_ab = float(fn(a, b))
    d_aa = float(fn(a, a))
    assert np.isfinite(d_ab) and d_ab > 0
    assert abs(d_aa) < 1e-6  # identical images -> zero distance
    # symmetric (squared-difference metric)
    assert abs(d_ab - float(fn(b, a))) < 1e-6


def test_lpips_missing_weights_degrades():
    assert L.lpips_fn("/nonexistent/weights.npz") is None


def test_metrics_cli_rejects_bad_weights_path(tmp_path):
    """--lpips_weights pointing nowhere must fail loudly, not silently
    report null LPIPS."""
    import metrics

    with pytest.raises(FileNotFoundError):
        metrics.evaluate([str(tmp_path)], lpips_weights="/nope.npz")
