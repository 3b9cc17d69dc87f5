import time, sys
T0=time.time()
def mark(s): print(f"[{time.time()-T0:8.1f}s] {s}", flush=True)
import jax, jax.numpy as jnp, numpy as np
import concurrent.futures as cf
from reduced3dgs_tpu.ops import tile_render as tr
from jax.experimental import pallas as pl

# 1080p shapes
width, height = 1920, 1080
grid_x, grid_y = 120, 68
num_tiles = grid_x * grid_y  # 8160
b_pad = 4845568  # padded_size(1<<22, 1920, 1080)
max_chunks = b_pad // tr.K

fwd = tr._build_fwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
                    False, fast=True)
def build(tag, fn, args):
    lowered = jax.jit(fn).lower(*args)
    mark(f"{tag} lowered")
    with cf.ThreadPoolExecutor(max_workers=3) as ex:
        for att in range(2):
            fut = ex.submit(lowered.compile)
            try:
                fut.result(timeout=300); mark(f"{tag} compiled"); return
            except cf.TimeoutError:
                mark(f"{tag} compile HUNG past 300s")
            except Exception as e:
                mark(f"{tag} compile failed: {str(e)[:200]}")
                return

base2 = jnp.zeros(2, jnp.int32)
ranges = jnp.zeros((2, num_tiles), jnp.int32)
feat = jnp.zeros((tr.FEAT_ROWS, b_pad), jnp.float32)
out_init = jnp.zeros((num_tiles, tr.PIX_ROWS, tr.NPIX), jnp.float32)
build("fwd", lambda b, r, f, o: fwd(b, r, f, o), (base2, ranges, feat, out_init))

bwd = tr._build_bwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
                    False, fast=True)
gpix = jnp.zeros((num_tiles, tr.PIX_ROWS, tr.NPIX), jnp.float32)
build("bwd", lambda b, r, f, g, s: bwd(b, r, f, g, s),
      (base2, ranges, feat, gpix, gpix))
