"""SIBR remote-viewer bridge (TCP), protocol-compatible with the
reference gaussian_renderer/network_gui.py:26-85 + the train-loop hook
(train.py:64-78):

  client -> 4-byte LE length + JSON {resolution, fovs, znear/zfar, flags,
  scaling_modifier, view matrix, view-projection matrix (Y/Z columns
  sign-flipped)}; server -> raw RGB bytes of the render + 4-byte LE
  length-prefixed source-path string.

The viewer itself is the external SIBR application (not vendored in the
reference either, .gitmodules:1-3).
"""

from __future__ import annotations

import json
import socket
import traceback

import numpy as np


class MiniCam:
    """Viewer-driven camera (scene/cameras.py:60-71)."""

    def __init__(self, width, height, fovy, fovx, znear, zfar,
                 world_view_transform, full_proj_transform):
        self.width = width
        self.height = height
        self.fov_y = fovy
        self.fov_x = fovx
        self.znear = znear
        self.zfar = zfar
        self.world_view_transform = np.asarray(world_view_transform,
                                               np.float32)
        self.full_proj_transform = np.asarray(full_proj_transform,
                                              np.float32)
        self.camera_center = np.linalg.inv(
            self.world_view_transform)[3, :3].astype(np.float32)

    def params(self):
        import math

        from reduced3dgs_tpu.ops.preprocess import CameraParams

        return CameraParams(
            viewmatrix=self.world_view_transform,
            projmatrix=self.full_proj_transform,
            campos=self.camera_center,
            tan_fovx=np.float32(math.tan(self.fov_x * 0.5)),
            tan_fovy=np.float32(math.tan(self.fov_y * 0.5)),
            width=self.width, height=self.height,
        )


class NetworkGUI:
    def __init__(self, host, port, source_path, trainer, pipe, background):
        self.source_path = source_path
        self.trainer = trainer
        self.pipe = pipe
        self.background = background
        self.conn = None
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.enabled = True
        try:
            self.listener.bind((host, port))
            self.listener.listen()
            self.listener.settimeout(0)
        except OSError as e:
            print(f"Network GUI disabled ({e})")
            self.enabled = False

    def _read(self):
        length = int.from_bytes(self.conn.recv(4), "little")
        message = self.conn.recv(length)
        return json.loads(message.decode("utf-8"))

    def _send(self, image_bytes, verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def _receive(self):
        msg = self._read()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None
        view = np.reshape(np.array(msg["view_matrix"], np.float32), (4, 4))
        view[:, 1] = -view[:, 1]
        view[:, 2] = -view[:, 2]
        proj = np.reshape(
            np.array(msg["view_projection_matrix"], np.float32), (4, 4))
        proj[:, 1] = -proj[:, 1]
        cam = MiniCam(width, height, msg["fov_y"], msg["fov_x"],
                      msg["z_near"], msg["z_far"], view, proj)
        return (cam, bool(msg["train"]), bool(msg["keep_alive"]),
                msg["scaling_modifier"])

    def poll(self, iteration):
        """Train-loop hook (train.py:64-78)."""
        if not self.enabled:
            return
        if self.conn is None:
            try:
                self.conn, addr = self.listener.accept()
                print(f"\nConnected by {addr}")
                self.conn.settimeout(None)
            except Exception:
                return
        while self.conn is not None:
            try:
                cam, do_training, keep_alive, scaling_mod = self._receive()
                image_bytes = None
                if cam is not None:
                    image_bytes = self._render(cam, scaling_mod)
                self._send(image_bytes, self.source_path)
                if do_training and (
                        iteration < self.trainer.opt_cfg.iterations
                        or not keep_alive):
                    break
            except Exception:
                traceback.print_exc()
                self.conn = None

    def _render(self, cam: MiniCam, scaling_modifier):
        import jax.numpy as jnp

        from reduced3dgs_tpu.renderer import render

        pool = self.trainer.state.pool
        out = render(
            pool.params.xyz, pool.features(), pool.params.scaling,
            pool.params.rotation, pool.params.opacity[:, 0], pool.degrees,
            cam.params(), self.background,
            width=cam.width, height=cam.height,
            instance_budget=self.trainer.initial_budget,
            alive_mask=pool.alive, scale_modifier=float(scaling_modifier),
            backend=self.pipe.backend,
        )
        img = np.asarray(jnp.clip(out.color, 0.0, 1.0))
        return memoryview((img * 255).astype(np.uint8).tobytes())
