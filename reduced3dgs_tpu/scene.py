"""Scene: dataset detection, camera lists, model save/load, redundancy.

Mirrors the reference Scene (scene/__init__.py:24-174): COLMAP vs Blender
auto-detection, resolution-scaled camera lists, cameras_extent from the
NeRF++ norm, point_cloud[_quantised][_half].ply naming, camera JSON dump,
and the redundancy-metric driver for mercy pruning.
"""

from __future__ import annotations

import json
import os
import random
import shutil

import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.cameras import Camera
from reduced3dgs_tpu.config import ModelParams
from reduced3dgs_tpu.data import dataset_readers as readers
from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.models.ply_io import (
    load_gaussian_ply, pool_from_arrays, save_gaussian_ply,
)
from reduced3dgs_tpu.ops.redundancy import redundancy_metric


def camera_to_json(idx, cam: Camera):
    """camera_to_JSON (utils/camera_utils.py:62-82)."""
    rt = np.zeros((4, 4))
    rt[:3, :3] = cam.R.transpose()
    rt[:3, 3] = cam.T
    rt[3, 3] = 1.0
    w2c = np.linalg.inv(rt)
    from reduced3dgs_tpu.ops.transforms import fov2focal

    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": w2c[:3, 3].tolist(),
        "rotation": [x.tolist() for x in w2c[:3, :3]],
        "fy": fov2focal(cam.fov_y, cam.height),
        "fx": fov2focal(cam.fov_x, cam.width),
    }


def search_max_iteration(folder):
    saves = [int(f.split("_")[-1]) for f in os.listdir(folder)]
    return max(saves)


class Scene:
    def __init__(self, args: ModelParams, pool: G.GaussianPool | None = None,
                 load_iteration=None, shuffle=True,
                 resolution_scales=(1.0,), lazy_images=False):
        self.model_path = args.model_path
        self.loaded_iter = None
        self.pool = pool

        if load_iteration:
            if load_iteration == -1:
                self.loaded_iter = search_max_iteration(
                    os.path.join(self.model_path, "point_cloud"))
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        # dataset detection (scene/__init__.py:46-52)
        if os.path.exists(os.path.join(args.source_path, "sparse")):
            info = readers.read_colmap_scene(
                args.source_path, args.images, args.eval)
        elif os.path.exists(os.path.join(args.source_path,
                                         "transforms_train.json")):
            print("Found transforms_train.json, assuming Blender data set!")
            info = readers.read_blender_scene(
                args.source_path, args.white_background, args.eval)
        else:
            raise ValueError(
                f"Could not recognize scene type: {args.source_path}")

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            shutil.copyfile(info.ply_path,
                            os.path.join(self.model_path, "input.ply"))
            cam_list = info.train_cameras + info.test_cameras
            with open(os.path.join(self.model_path, "cameras.json"),
                      "w") as f:
                json.dump([camera_to_json(i, self._make_camera(c, 1.0, args,
                                                               lazy=True))
                           for i, c in enumerate(cam_list)], f)

        if shuffle:
            random.shuffle(info.train_cameras)
            random.shuffle(info.test_cameras)

        self.cameras_extent = info.nerf_normalization["radius"]
        self.train_cameras = {}
        self.test_cameras = {}
        for scale in resolution_scales:
            print(f"Loading Train Cameras (scale {scale})")
            self.train_cameras[scale] = [
                self._make_camera(c, scale, args, lazy=lazy_images)
                for c in info.train_cameras]
            print(f"Loading Test Cameras (scale {scale})")
            self.test_cameras[scale] = [
                self._make_camera(c, scale, args, lazy=lazy_images)
                for c in info.test_cameras]

        if self.loaded_iter:
            self.load_model()
        elif pool is None:
            xyz, colors = info.point_cloud
            self.pool = G.create_from_pcd(xyz, colors)

    def _make_camera(self, info, scale, args, lazy=False):
        res = readers.pick_resolution(info, args.resolution, scale)
        image = None if lazy else readers.load_image(info, res)
        return Camera(
            uid=info.uid, colmap_id=info.uid, R=info.R, T=info.T,
            fov_x=info.fov_x, fov_y=info.fov_y, image=image,
            image_name=info.image_name, width=res[0], height=res[1],
        )

    # -- model IO (scene/__init__.py:80-96) ------------------------------
    def _ply_name(self, quantise=False, half_float=False, pack_xyz=False):
        if pack_xyz:
            # framework extension: f16 codebook centers + chunked
            # fixed-point uint16 xyz (models/ply_io.py xyz_codec="u16c")
            return "point_cloud_quantised_pack.ply"
        return ("point_cloud" + ("_quantised" if quantise else "")
                + ("_half" if half_float else "") + ".ply")

    def save(self, iteration, codebook_dict=None, quantise=False,
             half_float=False, pack_xyz=False):
        pc_path = os.path.join(self.model_path, "point_cloud",
                               f"iteration_{iteration}")
        save_gaussian_ply(
            os.path.join(pc_path,
                         self._ply_name(quantise, half_float, pack_xyz)),
            self.pool, codebook_dict, quantised=quantise,
            half_float=half_float,
            xyz_codec="u16c" if pack_xyz else None)

    def load_model(self, quantised=False, half_float=False,
                   pack_xyz=False):
        path = os.path.join(
            self.model_path, "point_cloud",
            f"iteration_{self.loaded_iter}",
            self._ply_name(quantised, half_float, pack_xyz))
        arrs = load_gaussian_ply(path, quantised=quantised or pack_xyz,
                                 half_float=half_float or pack_xyz)
        self.pool = pool_from_arrays(arrs)
        return self.pool

    def get_train_cameras(self, scale=1.0):
        return self.train_cameras[scale]

    def get_test_cameras(self, scale=1.0):
        return self.test_cameras[scale]

    # -- redundancy metric (scene/__init__.py:142-174) --------------------
    def calculate_redundancy_metric(self, pixel_scale=1.0,
                                    num_neighbours=30):
        cams = self.get_train_cameras()
        pool = self.pool
        projs = jnp.stack(
            [jnp.asarray(c.full_proj_transform) for c in cams])
        invs = jnp.stack(
            [jnp.asarray(c.inverse_full_proj_transform) for c in cams])
        hts = jnp.array([c.height for c in cams], jnp.int32)
        wds = jnp.array([c.width for c in cams], jnp.int32)
        return redundancy_metric(
            pool.params.xyz, pool.get_scaling(), pool.get_rotation(),
            pool.alive, projs, invs, hts, wds, pixel_scale=pixel_scale,
            num_neighbours=num_neighbours)
