"""Utility helpers shared across photometry_tpu."""

from .mathutils import (  # noqa: F401
    MAD_TO_SIGMA,
    mag2flux,
    flux2mag,
    add_proper_motion,
    sphere_distance,
    radec_to_cartesian,
    cartesian_to_radec,
    integrated_gaussian,
    nanmedian,
    nanmad,
    rms_timescale,
    ptp_metric,
    find_nearest,
    moving_median_central,
)
