"""Config system — dataclass mirror of the reference arguments/ package.

Field names, shorthand flags and defaults match the reference
(arguments/__init__.py:47-103) so CLI invocations from the reference's
README work unchanged.  Model directories stay self-describing: training
dumps a `cfg_args` file in the same `Namespace(...)` repr format
(train.py:188-189) and inference merges it back with CLI overrides
(get_combined_args, arguments/__init__.py:105-125).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from argparse import ArgumentParser, Namespace
from dataclasses import dataclass, field, fields


def _add_group(parser: ArgumentParser, cls, name: str, fill_none: bool = False):
    group = parser.add_argument_group(name)
    for f in fields(cls):
        shorthand = f.metadata.get("short")
        default = None if fill_none else f.default
        names = [f"--{f.name}"] + ([f"-{shorthand}"] if shorthand else [])
        if f.type in ("bool", bool):
            group.add_argument(*names, default=default, action="store_true")
        elif f.type in ("list", list) or isinstance(f.default, tuple):
            group.add_argument(*names, nargs="+", type=int,
                               default=None if fill_none else list(f.default))
        else:
            typ = type(f.default) if f.default is not None else str
            group.add_argument(*names, type=typ, default=default)


def _extract(cls, args: Namespace):
    kw = {}
    for f in fields(cls):
        v = getattr(args, f.name, None)
        if v is None:
            v = f.default_factory() if f.default is dataclasses.MISSING else f.default
        if isinstance(f.default, tuple) and isinstance(v, list):
            v = tuple(v)
        kw[f.name] = v
    return cls(**kw)


@dataclass(frozen=True)
class ModelParams:
    """Reference ModelParams (arguments/__init__.py:47-62)."""

    sh_degree: int = 3
    source_path: str = field(default="", metadata={"short": "s"})
    model_path: str = field(default="", metadata={"short": "m"})
    images: str = field(default="images", metadata={"short": "i"})
    resolution: int = field(default=-1, metadata={"short": "r"})
    white_background: bool = field(default=False, metadata={"short": "w"})
    data_device: str = "cuda"  # accepted for CLI parity; ignored on TPU
    eval: bool = False

    def post(self):
        return dataclasses.replace(
            self, source_path=os.path.abspath(self.source_path)
            if self.source_path else ""
        )


@dataclass(frozen=True)
class PipelineParams:
    """Reference PipelineParams (arguments/__init__.py:64-69).

    convert_SHs_python / compute_cov3D_python selected the torch dual
    path in the reference; here they select the pure-jnp oracle renderer
    (the equivalent cross-check backend).
    """

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    backend: str = "pallas"  # TPU addition: "pallas" | "xla"
    # TPU addition: fuse up to N boundary-free train iterations into one
    # lax.scan launch (amortizes per-launch dispatch; 1 = reference-exact
    # one-launch-per-iteration behavior)
    fused_steps: int = 1
    # TPU addition: per-Gaussian gradient reduction payload precision.
    # "bf16x2" (default) packs gradient column pairs into one int32
    # sort payload — the reduction sort is the largest single device
    # cost of the train step, and the packing measured quality-neutral
    # (one-step grad error <= 0.2%; 2-seed training A/B within the
    # 0.42 dB seed noise, experiments/grad_reduce_ab.json).  "f32"
    # keeps full precision (the render() API default, used by the
    # gradient parity tests).
    grad_reduce: str = "bf16x2"


@dataclass(frozen=True)
class OptimizationParams:
    """Reference OptimizationParams (arguments/__init__.py:71-103)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False
    lambda_alpha_regul: float = 0.0
    mercy_points: bool = False
    lambda_mercy: float = 1.0
    box_size: float = 1.0
    lambda_sh_sparsity: float = 0.0
    prune_dead_points: bool = False
    store_grads: bool = False
    mercy_interval: int = 10
    cdist_threshold: float = 0.0
    std_threshold: float = 0.0
    mercy_minimum: int = 3
    variable_sh_bands: bool = False
    mercy_type: str = "redundancy_opacity"


def add_model_params(parser, fill_none=False):
    _add_group(parser, ModelParams, "Loading Parameters", fill_none)


def add_pipeline_params(parser, fill_none=False):
    _add_group(parser, PipelineParams, "Pipeline Parameters", fill_none)


def add_optimization_params(parser, fill_none=False):
    _add_group(parser, OptimizationParams, "Optimization Parameters", fill_none)


def extract_model(args) -> ModelParams:
    return _extract(ModelParams, args).post()


def extract_pipeline(args) -> PipelineParams:
    return _extract(PipelineParams, args)


def extract_optimization(args) -> OptimizationParams:
    return _extract(OptimizationParams, args)


def dump_cfg_args(model_path: str, args: Namespace):
    """Write the reference-format cfg_args file (train.py:188-189)."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(str(Namespace(**vars(args))))


def get_combined_args(parser: ArgumentParser, argv=None) -> Namespace:
    """Merge CLI args with the model dir's stored cfg_args
    (arguments/__init__.py:105-125): CLI wins when not None."""
    args_cmdline = parser.parse_args(sys.argv[1:] if argv is None else argv)
    cfgfile_string = "Namespace()"
    try:
        cfgfilepath = os.path.join(args_cmdline.model_path, "cfg_args")
        with open(cfgfilepath) as cfg_file:
            print(f"Config file found: {cfgfilepath}")
            cfgfile_string = cfg_file.read()
    except (TypeError, FileNotFoundError):
        pass
    args_cfgfile = eval(cfgfile_string, {"Namespace": Namespace})  # noqa: S307
    merged = vars(args_cfgfile).copy()
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)
