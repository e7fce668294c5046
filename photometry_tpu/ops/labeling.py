"""
Connected components and seeded segmentation on TPU.

The reference builds pixel masks with sklearn DBSCAN (eps=sqrt(2), i.e.
8-connectivity on the pixel grid — reference k2p2v2.py:63-86) followed by
skimage watershed segmentation with catalog-guided markers
(k2p2v2.py:89-288).  Neither maps to TPU as-is; here they become
fixed-point label-propagation kernels:

- :func:`label_components`: 8-connected components by iterative min-label
  propagation inside a ``lax.while_loop``.  On a (H, W) grid this converges
  in at most H+W iterations; each iteration is a 3x3 min-pool — pure VPU work.
- :func:`watershed_segment`: marker-seeded segmentation by monotone steepest-
  ascent label adoption: every unlabeled above-threshold pixel repeatedly
  adopts the label of its highest-priority (most elevated) labeled neighbor.
  This reproduces watershed basins for the smooth (Gaussian-blurred) images
  K2P2 feeds it, while being a data-independent-shape fixed-point loop.

Batch layout: every function accepts (H, W) *plus any trailing batch dims* —
spatial neighbors are always the first two axes.  For thousands of small
stamps, pass (h, w, N) with the batch LAST: the batch axis then fills the
TPU lane dimension (128 lanes), where a leading-batch ``vmap`` would leave a
17-px stamp width at ~13% lane utilization inside every while-loop step
(measured ~5x faster at N=2048, 17x17 stamps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["label_components", "watershed_segment", "dbscan_labels"]

_INF = jnp.inf


def _pad_spatial(x, value):
    """Pad the first two (spatial) axes by 1; trailing batch dims untouched."""
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, mode="constant", constant_values=value)


def _neighbor_min(lab, mask, connectivity: int = 2):
    """Min of labels over the 3x3 (or cross) neighborhood, inf outside mask."""
    H, W = lab.shape[:2]
    big = jnp.where(mask, lab, _INF)
    p = _pad_spatial(big, _INF)
    offs = [(0, 1), (2, 1), (1, 0), (1, 2), (1, 1)]
    if connectivity == 2:
        offs += [(0, 0), (0, 2), (2, 0), (2, 2)]
    out = jnp.full_like(big, _INF)
    for dy, dx in offs:
        out = jnp.minimum(out, p[dy:dy + H, dx:dx + W])
    return out


def label_components(mask, connectivity: int = 2, max_iters: int = 4096):
    """Label connected components of a boolean mask (trailing dims = batch).

    Returns int32 labels: 0 for background, 1..n for components (labels are
    contiguous per image and ordered by the component's smallest flat pixel
    index, which makes results deterministic).

    Equivalent to DBSCAN with eps=sqrt(2), min_samples=1 on pixel coordinates
    (the reference's usage at k2p2v2.py:63-86; its min_samples=4 core-point
    rule is applied by callers as a post-filter on component size).
    """
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape[:2]
    tail = mask.shape[2:]
    init = jnp.arange(H * W, dtype=jnp.float32).reshape(
        (H, W) + (1,) * len(tail))
    init = jnp.where(mask, init, _INF)

    def cond(state):
        lab, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        new = _neighbor_min(lab, mask, connectivity)
        new = jnp.where(mask, jnp.minimum(lab, new), _INF)
        return new, jnp.any(new != lab), it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (init, jnp.array(True), 0))

    # Relabel to contiguous 1..n per image (0 = background).  The root of
    # each component is the pixel whose flat index equals its label value.
    flat = lab.reshape((H * W,) + tail)
    idx = jnp.arange(H * W, dtype=jnp.float32).reshape(
        (H * W,) + (1,) * len(tail))
    mflat = mask.reshape(flat.shape)
    is_root = mflat & (flat == idx)
    comp_rank = jnp.cumsum(is_root.astype(jnp.int32), axis=0)
    root_idx = jnp.where(jnp.isinf(flat), 0, flat).astype(jnp.int32)
    ranks = jnp.take_along_axis(comp_rank, root_idx, axis=0)
    labels = jnp.where(mflat, ranks, 0)
    return labels.reshape(mask.shape).astype(jnp.int32)


def dbscan_labels(mask, min_samples: int = 4, max_iters: int = 4096):
    """Exact DBSCAN(eps=sqrt(2), min_samples) on a pixel grid
    (trailing dims = batch).

    Reference k2p2v2.py:63-86 runs sklearn DBSCAN on the above-threshold
    pixel coordinates.  On a grid with eps just above sqrt(2), the
    eps-neighborhood is the 3x3 block (self included), so:

    - core points:   mask pixels with >= min_samples mask pixels in their
      3x3 neighborhood (self included);
    - clusters:      8-connected components of the core points;
    - border points: non-core mask pixels 8-adjacent to a core point; they
      join the smallest-labeled adjacent cluster (sklearn assigns them to
      whichever core reaches them first — only ambiguous for pixels
      touching two clusters, where we pick deterministically);
    - everything else is noise (label 0) — the rule the plain
      component-size cut missed (it kept line-shaped structures whose
      pixels all have < min_samples neighbors).

    Returns int32 labels, 0 = noise/background.
    """
    mask = jnp.asarray(mask, bool)
    H, W = mask.shape[:2]
    m = mask.astype(jnp.float32)
    p = _pad_spatial(m, 0.0)
    cnt = jnp.zeros_like(m)
    for dy in range(3):
        for dx in range(3):
            cnt = cnt + p[dy:dy + H, dx:dx + W]
    core = mask & (cnt >= min_samples)
    lab_core = label_components(core, connectivity=2, max_iters=max_iters)
    nb = _neighbor_min(lab_core.astype(jnp.float32), core)
    border = mask & ~core & jnp.isfinite(nb)
    return jnp.where(core, lab_core,
                     jnp.where(border, nb, 0.0).astype(jnp.int32))


def _neighbor_best(priority, labels, connectivity: int = 2):
    """For each pixel: (best neighbor priority, its label) among labeled nbrs."""
    H, W = priority.shape[:2]
    neg = jnp.float32(-3.4e38)
    pr = jnp.where(labels > 0, priority, neg)
    p_pr = _pad_spatial(pr, neg)
    p_lb = _pad_spatial(labels, 0)
    offs = [(0, 1), (2, 1), (1, 0), (1, 2)]
    if connectivity == 2:
        offs += [(0, 0), (0, 2), (2, 0), (2, 2)]
    best_pr = jnp.full_like(pr, neg)
    best_lb = jnp.zeros_like(labels)
    for dy, dx in offs:
        npr = p_pr[dy:dy + H, dx:dx + W]
        nlb = p_lb[dy:dy + H, dx:dx + W]
        take = npr > best_pr
        best_pr = jnp.where(take, npr, best_pr)
        best_lb = jnp.where(take, nlb, best_lb)
    return best_pr, best_lb


def watershed_segment(elevation, markers, mask, connectivity: int = 2,
                      max_iters: int = 4096):
    """Marker-seeded segmentation of ``mask`` guided by an elevation image
    (trailing dims = batch).

    TPU counterpart of skimage ``watershed(-blurred_flux, markers, mask=...)``
    as used by K2P2 (reference k2p2v2.py:89-288), via the flood's
    *pop-order* structure instead of front growth:

    1. Vincent-Soille flooding pops pixels from a heap in elevation order,
       which globally sorts pops by each pixel's **pop priority**
       ``v(p) = max over paths from a marker of (min elevation along the
       path incl. p)`` — the maximin/bottleneck value.  Stage 1 computes
       ``v`` by monotone value iteration (``v = max(v, min(elev, best
       neighbor v))``), markers seeded at their own elevation.
    2. skimage labels a pixel at PUSH time with the label of its first
       neighbor to POP — i.e. its **argmax-v neighbor**.  Stage 2
       propagates labels down that (static) parent forest; parents strictly
       ascend ``v``, so the chain always terminates at a marker.

    This reproduces the flooding assignment exactly wherever neighbor pop
    priorities are distinct; only exact float ties in ``v`` (where skimage's
    own answer is heap-insertion-age dependent) fall back to a fixed
    neighbor scan order (measured: ~0.13% of cluster pixels on the
    tie-break corpus vs ~2.5% for steepest-ascent front growth).  A final
    greedy phase adopts any pixels a ``v`` tie-cycle left unresolved.

    Parameters:
        elevation: (H, W, ...) float image — higher = closer to a peak
            (note: *inverted* sign convention vs skimage's flooding).
        markers: (H, W, ...) int32, >0 at seed pixels, 0 elsewhere.
        mask: (H, W, ...) bool, segmentation domain.

    Returns:
        (H, W, ...) int32 labels (0 outside mask / unreached).
    """
    elevation = jnp.asarray(elevation, jnp.float32)
    mask = jnp.asarray(mask, bool)
    labels0 = jnp.where(mask, jnp.asarray(markers, jnp.int32), 0)
    H, W = elevation.shape[:2]
    neg = jnp.float32(-3.4e38)
    offs = [(0, 1), (2, 1), (1, 0), (1, 2)]
    if connectivity == 2:
        offs += [(0, 0), (0, 2), (2, 0), (2, 2)]

    def nbr_max(v):
        p = _pad_spatial(v, neg)
        best = jnp.full_like(v, neg)
        for dy, dx in offs:
            best = jnp.maximum(best, p[dy:dy + H, dx:dx + W])
        return best

    # ---- Stage 1: pop priorities (maximin value iteration) ----
    elev_m = jnp.where(mask, elevation, neg)
    v0 = jnp.where(labels0 > 0, elev_m, neg)

    def cond1(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body1(state):
        v, _, it = state
        new = jnp.maximum(v, jnp.where(mask, jnp.minimum(elev_m, nbr_max(v)),
                                       neg))
        return new, jnp.any(new > v), it + 1

    v, _, _ = jax.lax.while_loop(cond1, body1, (v0, jnp.array(True), 0))
    v = jnp.where(mask, v, neg)

    # ---- Stage 2: labels flow down the argmax-v parent forest ----
    p_v = _pad_spatial(v, neg)

    def body2(state):
        labels, _, it = state
        p_lb = _pad_spatial(labels, 0)
        best_v = jnp.full_like(v, neg)
        best_lb = jnp.zeros_like(labels)
        for dy, dx in offs:
            nv = p_v[dy:dy + H, dx:dx + W]
            nlb = p_lb[dy:dy + H, dx:dx + W]
            take = nv > best_v          # strict: first-scanned wins v ties
            best_v = jnp.where(take, nv, best_v)
            best_lb = jnp.where(take, nlb, best_lb)
        can = mask & (labels == 0) & (best_lb > 0)
        new = jnp.where(can, best_lb, labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond1, body2, (labels0, jnp.array(True), 0))

    # ---- Stage 3: greedy mop-up for tie-cycle leftovers ----
    def body3(state):
        labels, _, it = state
        nb_pr, nb_lb = _neighbor_best(elevation, labels, connectivity)
        can = mask & (labels == 0) & (nb_lb > 0)
        new = jnp.where(can, nb_lb, labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond1, body3, (labels, jnp.array(True), 0))
    return labels
