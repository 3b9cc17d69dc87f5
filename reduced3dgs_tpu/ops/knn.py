"""K-nearest-neighbour ops (JAX) — the TPU-native simple-knn.

The reference simple-knn (submodules/simple-knn/simple_knn.cu) provides
  * distCUDA2: mean of the squared distances to the 3 exact nearest
    neighbours (boxMeanDist, simple_knn.cu:149-186) — used for scale init,
  * knn_index2 / distIndex2: K nearest neighbour indices — used by the
    redundancy metric (scene/__init__.py:160).

Both CUDA kernels prune with Morton-sorted boxes.  Here:
  * exact mode: blocked brute force with a running top-k merge — O(P^2)
    flops but MXU/VPU-friendly and exact; the default for small P,
  * window mode: Morton sort + candidate window in sorted order — O(P*W),
    approximate (recall < 1 for adversarial distributions), the default
    for large P where the redundancy heuristic doesn't need exactness.

Everything is jittable with static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EXACT_LIMIT = 32768  # brute force below this many points
_BLOCK = 2048  # candidate block for the brute-force merge
_QCHUNK = 1024  # query rows per step


def _expand_bits_10(v):
    """Spread 10 bits to every 3rd position (Morton interleave helper)."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(points, offset=0.0):
    """30-bit Morton codes over the point bbox (cf. coord2Morton,
    simple_knn.cu:46-71).  `offset` shifts the quantization grid (in
    cells) to diversify candidate windows across orderings."""
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    q = jnp.clip(
        (points - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0 + offset,
        0, 1023,
    )
    q = q.astype(jnp.uint32)
    return (
        _expand_bits_10(q[:, 0])
        | (_expand_bits_10(q[:, 1]) << 1)
        | (_expand_bits_10(q[:, 2]) << 2)
    ).astype(jnp.uint32)


def _brute_knn(points, k):
    """Exact (P, k) squared dists + indices via blocked top-k merges."""
    p = points.shape[0]
    qpad = (-p) % _QCHUNK
    queries = jnp.pad(points, ((0, qpad), (0, 0)))
    nq = queries.shape[0]
    bpad = (-p) % _BLOCK
    cands = jnp.pad(points, ((0, bpad), (0, 0)), constant_values=jnp.inf)
    nb = cands.shape[0] // _BLOCK

    def per_chunk(qstart, _):
        q = jax.lax.dynamic_slice_in_dim(queries, qstart, _QCHUNK, 0)
        qidx = qstart + jnp.arange(_QCHUNK)

        def per_block(b, best):
            best_d, best_i = best
            c = jax.lax.dynamic_slice_in_dim(cands, b * _BLOCK, _BLOCK, 0)
            cidx = b * _BLOCK + jnp.arange(_BLOCK)
            d2 = (
                (q * q).sum(-1, keepdims=True)
                - 2.0 * q @ c.T
                + (c * c).sum(-1)[None, :]
            )  # (Q, BLOCK)
            d2 = jnp.where(
                (cidx[None, :] == qidx[:, None]) | (cidx[None, :] >= p),
                jnp.inf, d2,
            )
            all_d = jnp.concatenate([best_d, d2], axis=1)
            all_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(cidx[None, :], d2.shape)], axis=1
            )
            nd, sel = jax.lax.top_k(-all_d, k)
            return (-nd, jnp.take_along_axis(all_i, sel, axis=1))

        init = (
            jnp.full((_QCHUNK, k), jnp.inf),
            jnp.zeros((_QCHUNK, k), jnp.int32),
        )
        best_d, best_i = jax.lax.fori_loop(0, nb, per_block, init)
        return qstart + _QCHUNK, (best_d, best_i)

    _, (dists, idx) = jax.lax.scan(per_chunk, 0, None, length=nq // _QCHUNK)
    return (
        dists.reshape(nq, k)[:p],
        idx.reshape(nq, k)[:p],
    )


# Orderings for the candidate sweep: (axis permutation, grid offset).
# Different interleave axis orders + a half-cell shift give near-disjoint
# Morton locality gaps, so the union recovers almost all true neighbours.
_ORDERINGS = (
    ((0, 1, 2), 0.0),
    ((0, 1, 2), 341.0),
    ((0, 1, 2), 682.0),
    ((2, 0, 1), 170.0),
)


def _window_candidates(points, order, window):
    """(P, 2W) candidate original-ids + squared dists for one ordering."""
    p = points.shape[0]
    sp = points[order]
    off = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )
    idx = jnp.arange(p)[:, None] + off[None, :]  # (P, 2W) sorted-space
    ok = (idx >= 0) & (idx < p)
    idx_c = jnp.clip(idx, 0, p - 1)
    d2 = ((sp[idx_c] - sp[:, None, :]) ** 2).sum(-1)
    d2 = jnp.where(ok, d2, jnp.inf)
    # back to original row order / original ids
    cand = jnp.zeros((p, off.shape[0]), jnp.int32).at[order].set(order[idx_c])
    dist = jnp.full((p, off.shape[0]), jnp.inf).at[order].set(d2)
    return cand, dist


def _window_knn(points, k, window):
    """Approximate (P, k) via +-window sweeps over several Morton
    orderings, deduplicated union, top-k."""
    cands, dists = [], []
    for perm, offset in _ORDERINGS:
        codes = morton_codes(points[:, list(perm)], offset)
        order = jnp.argsort(codes)
        c, d = _window_candidates(points, order, window)
        cands.append(c)
        dists.append(d)
    cand = jnp.concatenate(cands, axis=1)  # (P, R*2W)
    dist = jnp.concatenate(dists, axis=1)
    # dedupe: sort lexicographically by (id, dist) so each id's first
    # occurrence carries its best distance (out-of-window slots reuse a
    # clipped id with inf dist and must lose the tie), then kill repeats.
    cand_s, dist_s = jax.lax.sort((cand, dist), num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros((cand.shape[0], 1), bool), cand_s[:, 1:] == cand_s[:, :-1]],
        axis=1,
    )
    dist_s = jnp.where(dup, jnp.inf, dist_s)
    nd, sel = jax.lax.top_k(-dist_s, k)
    return -nd, jnp.take_along_axis(cand_s, sel, axis=1)


@partial(jax.jit, static_argnames=("k", "window", "exact"))
def knn(points, k: int, window: int = 64, exact: bool | None = None):
    """(P, k) squared distances + indices of the k nearest neighbours.

    exact=None auto-selects brute force below EXACT_LIMIT points.
    """
    if exact is None:
        exact = points.shape[0] <= EXACT_LIMIT
    if exact:
        return _brute_knn(points, k)
    return _window_knn(points, k, window)


def knn_indices(points, k: int, **kw):
    """distIndex2 equivalent (spatial.cu:28-41): neighbour indices only."""
    return knn(points, k, **kw)[1]


def mean_knn_dist2(points, **kw):
    """distCUDA2 equivalent: mean of the squared distances to the 3
    nearest neighbours (simple_knn.cu:185)."""
    d2, _ = knn(points, 3, **kw)
    return d2.mean(axis=1)
