"""Tests of quality flag handling (counterpart of reference tests/test_quality.py)."""

import numpy as np
import jax.numpy as jnp

from photometry_tpu.quality import (TESSQualityFlags, PixelQualityFlags,
                                    CorrectorQualityFlags)


def test_flag_values_are_powers_of_two():
    for cls in (TESSQualityFlags, PixelQualityFlags, CorrectorQualityFlags):
        for flag in cls.STRINGS:
            assert flag > 0 and (flag & (flag - 1)) == 0


def test_decode():
    q = TESSQualityFlags.AttitudeTweak | TESSQualityFlags.Desat
    desc = TESSQualityFlags.decode(q)
    assert "Attitude tweak" in desc
    assert "Reaction wheel desaturation event" in desc
    assert len(desc) == 2
    assert TESSQualityFlags.decode(0) == []


def test_filter_scalar_and_array():
    assert TESSQualityFlags.filter(0)
    assert not TESSQualityFlags.filter(TESSQualityFlags.SafeMode)
    # ZeroCrossing is not in the default bitmask:
    assert TESSQualityFlags.filter(TESSQualityFlags.ZeroCrossing)
    q = np.array([0, 1, 16, 4096])
    np.testing.assert_array_equal(
        TESSQualityFlags.filter(q), [True, False, True, False])
    # Same thing on a JAX array (jit-safe path):
    out = TESSQualityFlags.filter(jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(out), [True, False, True, False])


def test_filter_custom_flags():
    q = np.array([0, 2, 8, 2 | 8])
    res = TESSQualityFlags.filter(q, flags=2)
    np.testing.assert_array_equal(res, [True, False, True, False])


def test_binary_repr():
    assert TESSQualityFlags.binary_repr(5) == "0" * 29 + "101"
    arr = TESSQualityFlags.binary_repr([1, 2])
    assert arr[0].endswith("1") and arr[1].endswith("10")


def test_default_bitmasks():
    assert PixelQualityFlags.DEFAULT_BITMASK == PixelQualityFlags.ManualExclude
    assert CorrectorQualityFlags.DEFAULT_BITMASK == 3
    # FFI-relevant bitmask must not include ManualExclude:
    assert TESSQualityFlags.FFI_RELEVANT_BITMASK & TESSQualityFlags.ManualExclude == 0
