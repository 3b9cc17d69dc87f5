"""SIBR remote-viewer bridge: wire-protocol loopback integration test.

Speaks the viewer side of the protocol (gaussian_renderer/network_gui.py
:26-85 in the reference) against a live NetworkGUI over a real TCP
socket: 4-byte LE length + JSON request in, raw RGB frame + length-
prefixed verify string back.  The rendered frame must match a direct
render() with the same camera.
"""

import json
import socket
import struct
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.cameras import Camera
from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.network_gui import NetworkGUI
from reduced3dgs_tpu.renderer import render

W, H = 96, 80


def _make_pool(n=48):
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 0.6, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return G.create_from_pcd(pts, cols, capacity=1024)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed early"
        buf += chunk
    return buf


def test_viewer_roundtrip():
    pool = _make_pool()
    trainer = SimpleNamespace(
        state=SimpleNamespace(pool=pool),
        opt_cfg=SimpleNamespace(iterations=100),
        initial_budget=1 << 13,
    )
    pipe = SimpleNamespace(backend="pallas")
    bg = jnp.zeros(3)
    gui = NetworkGUI("127.0.0.1", 0, "/data/scene", trainer, pipe, bg)
    assert gui.enabled
    port = gui.listener.getsockname()[1]

    cam = Camera.look_at(eye=(0, 0, -3), target=(0, 0, 0), width=W, height=H)
    cp = cam.params()
    # the server un-flips the SIBR view conventions (view cols 1,2 and
    # proj col 1 negated), so the client pre-flips
    view = np.array(cp.viewmatrix, np.float32).copy()
    view[:, 1] = -view[:, 1]
    view[:, 2] = -view[:, 2]
    proj = np.array(cp.projmatrix, np.float32).copy()
    proj[:, 1] = -proj[:, 1]
    import math
    msg = {
        "resolution_x": W, "resolution_y": H,
        "train": True, "keep_alive": False,
        "scaling_modifier": 1.0,
        "fov_x": 2 * math.atan(float(cp.tan_fovx)),
        "fov_y": 2 * math.atan(float(cp.tan_fovy)),
        "z_near": 0.01, "z_far": 100.0,
        "view_matrix": view.ravel().tolist(),
        "view_projection_matrix": proj.ravel().tolist(),
    }

    client = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    client.connect(("127.0.0.1", port))
    payload = json.dumps(msg).encode()
    client.sendall(struct.pack("<I", len(payload)) + payload)

    gui.poll(iteration=50)  # accept, render, reply, then break (train=True)

    frame = _recv_exact(client, H * W * 3)
    vlen = struct.unpack("<I", _recv_exact(client, 4))[0]
    verify = _recv_exact(client, vlen).decode("ascii")
    client.close()
    gui.listener.close()

    assert verify == "/data/scene"
    img = np.frombuffer(frame, np.uint8).reshape(H, W, 3)

    out = render(
        pool.params.xyz, pool.features(), pool.params.scaling,
        pool.params.rotation, pool.params.opacity[:, 0], pool.degrees,
        cp, bg, width=W, height=H, instance_budget=1 << 13,
        alive_mask=pool.alive, backend="pallas")
    expect = (np.clip(np.asarray(out.color), 0, 1) * 255).astype(np.uint8)
    assert img.std() > 1.0  # a real (non-constant) frame came back
    np.testing.assert_allclose(img, expect, atol=1)


def test_viewer_session_multiframe():
    """A realistic SIBR session through ONE poll call: keep_alive frames
    at two resolutions, a scaling_modifier change, a zero-resolution
    status message (no frame, verify string only), then a train=True
    frame that releases the train loop — the reference's per-iteration hook
    semantics (train.py:64-78)."""
    import math

    pool = _make_pool()
    trainer = SimpleNamespace(
        state=SimpleNamespace(pool=pool),
        opt_cfg=SimpleNamespace(iterations=100),
        initial_budget=1 << 13,
    )
    gui = NetworkGUI("127.0.0.1", 0, "/data/scene", trainer,
                     SimpleNamespace(backend="pallas"), jnp.zeros(3))
    port = gui.listener.getsockname()[1]

    def msg_for(w, h, train, keep_alive, scaling=1.0):
        cam = Camera.look_at(eye=(0, 0, -3), target=(0, 0, 0),
                             width=w, height=h)
        cp = cam.params()
        view = np.array(cp.viewmatrix, np.float32).copy()
        view[:, 1] = -view[:, 1]
        view[:, 2] = -view[:, 2]
        proj = np.array(cp.projmatrix, np.float32).copy()
        proj[:, 1] = -proj[:, 1]
        return {
            "resolution_x": w, "resolution_y": h,
            "train": train, "keep_alive": keep_alive,
            "scaling_modifier": scaling,
            "fov_x": 2 * math.atan(float(cp.tan_fovx)),
            "fov_y": 2 * math.atan(float(cp.tan_fovy)),
            "z_near": 0.01, "z_far": 100.0,
            "view_matrix": view.ravel().tolist(),
            "view_projection_matrix": proj.ravel().tolist(),
        }

    frames = [
        (64, 48, dict(train=False, keep_alive=True)),
        (96, 80, dict(train=False, keep_alive=True, scaling=0.5)),
        (0, 0, dict(train=False, keep_alive=True)),  # status-only
        (64, 48, dict(train=True, keep_alive=False)),  # releases loop
    ]
    client = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    client.connect(("127.0.0.1", port))
    for w, h, kw in frames:
        payload = json.dumps(msg_for(max(w, 1), max(h, 1), **kw)).encode()
        if w == 0:
            m = msg_for(64, 48, **kw)
            m["resolution_x"] = m["resolution_y"] = 0
            payload = json.dumps(m).encode()
        client.sendall(struct.pack("<I", len(payload)) + payload)

    gui.poll(iteration=50)  # serves ALL queued frames, exits on train

    stds = []
    for w, h, _ in frames:
        if w > 0:
            img = np.frombuffer(
                _recv_exact(client, h * w * 3), np.uint8).reshape(h, w, 3)
            stds.append(img.std())
        vlen = struct.unpack("<I", _recv_exact(client, 4))[0]
        assert _recv_exact(client, vlen).decode("ascii") == "/data/scene"
    client.close()
    gui.listener.close()
    assert all(s > 1.0 for s in stds)  # every frame was a real render
