"""Pallas segment-histogram kernel: per-ring log-flux histograms on-chip.

The XLA formulation of ``hist[s, b] = #{i: seg[i]==s, bucket[i]==b}``
(ops.stats._segment_histogram_matmul) materialises a (chunk, n_buckets)
one-hot in HBM per chunk — ~8.6 GB of write+read traffic per 2048^2 frame
at 512 buckets, which makes the radial background component the dominant
term of the prepare stage.  This kernel builds both one-hots in VMEM and
accumulates the (segments, buckets) table on-chip across a sequential
grid, so HBM touches only the pixel inputs (~8 bytes/pixel):

    hist += onehot_seg(seg)^T  @  (onehot_bucket(b) & good)

as one (SEG_PAD, CH) x (CH, n_buckets) MXU dot per grid step.  Counts are
exact: one-hots are bf16-exact 0/1 and per-step counts stay far below
f32's 2^24 integer range.

Mosaic constraints honoured (CLAUDE.md): inputs are reshaped to
(rows, 128) so block shapes keep sublane%8 / lane%128; the one contracting
dim of the dot comes from an in-kernel (a, b)->(a*b) reshape; iota is
integer-typed; scoped VMEM stays ~6 MB under the 16 MB default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["segment_histogram_tpu", "pallas_supported"]

CH = 4096          #: pixels per grid step (32 x 128)
SEG_PAD = 64       #: padded segment rows (multiple of 8, >= n_segments)


def pallas_supported() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _kernel(seg_ref, b_ref, hist_ref, *, n_buckets: int):
    import jax.experimental.pallas as pl  # local: keep CPU imports light

    step = pl.program_id(1)

    seg = seg_ref[0]                          # (64, 128) int32, -1 = pad
    b = b_ref[0]                              # (64, 128) int32, -1 = masked

    # One-hots built as 3-D tiles (lane dim = the one-hot width), then the
    # two leading sublane dims merge — Mosaic handles (a, b, L)->(a*b, L)
    # but not a full flatten to 1-D:
    seg_cols = jax.lax.broadcasted_iota(jnp.int32, (32, 128, SEG_PAD), 2)
    oh_s = (seg[:, :, None] == seg_cols).astype(jnp.bfloat16)
    oh_s = oh_s.reshape(CH, SEG_PAD)
    b_cols = jax.lax.broadcasted_iota(jnp.int32, (32, 128, n_buckets), 2)
    oh_b = (b[:, :, None] == b_cols).astype(jnp.bfloat16)
    oh_b = oh_b.reshape(CH, n_buckets)

    part = jax.lax.dot_general(
        oh_s, oh_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # (SEG_PAD, n_buckets)

    @pl.when(step == 0)
    def _init():
        hist_ref[...] = part[None]

    @pl.when(step != 0)
    def _acc():
        hist_ref[...] += part[None]


@functools.partial(jax.jit, static_argnames=("n_segments", "n_buckets"))
def segment_histogram_tpu(seg_ids, bucket_idx, good, n_segments: int,
                          n_buckets: int):
    """Exact (..., n_segments, n_buckets) count tables.

    ``seg_ids``: (N,) int32 shared across frames; ``bucket_idx``/``good``:
    (N,) or (F, N) per frame.  Requires n_segments <= SEG_PAD and
    n_buckets % 128 == 0; callers fall back to the XLA matmul histogram
    otherwise (ops.stats.segment_kde_mode).
    """
    import jax.experimental.pallas as pl

    if n_segments > SEG_PAD or n_buckets % 128:
        raise ValueError("shape outside kernel support")
    squeeze = bucket_idx.ndim == 1
    if squeeze:
        bucket_idx = bucket_idx[None]
        good = good[None]
    F, N = bucket_idx.shape
    pad = (-N) % CH
    b = jnp.where(good, bucket_idx, -1).astype(jnp.int32)
    seg = jnp.broadcast_to(seg_ids.astype(jnp.int32)[None], (F, N))
    if pad:
        b = jnp.concatenate([b, jnp.full((F, pad), -1, jnp.int32)], axis=1)
        seg = jnp.concatenate([seg, jnp.full((F, pad), -1, jnp.int32)], axis=1)
    steps = (N + pad) // CH
    seg2 = seg.reshape(F, steps * 32, 128)
    b2 = b.reshape(F, steps * 32, 128)

    hist = pl.pallas_call(
        functools.partial(_kernel, n_buckets=n_buckets),
        grid=(F, steps),
        in_specs=[
            pl.BlockSpec((1, 32, 128), lambda f, j: (f, j, 0)),
            pl.BlockSpec((1, 32, 128), lambda f, j: (f, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, SEG_PAD, n_buckets), lambda f, j: (f, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, SEG_PAD, n_buckets), jnp.float32),
    )(seg2, b2)
    out = hist[:, :n_segments]
    return out[0] if squeeze else out
