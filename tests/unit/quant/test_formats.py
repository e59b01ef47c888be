import jax.numpy as jnp
import numpy as np
import pytest

from modelopt_tpu.quant.formats import (
    cast_to_fp,
    cast_to_fp_numpy,
    get_format,
    parse_format,
)


def test_parse_format():
    assert parse_format("e2m1").maxval == 6.0
    assert parse_format((4, 3)).maxval == 448.0
    assert parse_format("e5m2").maxval == 57344.0
    assert parse_format("e8m0").man_bits == 0
    with pytest.raises(ValueError):
        parse_format("int8")


def test_e2m1_grid():
    # All representable e2m1 values round to themselves.
    grid = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)
    grid = np.concatenate([grid, -grid])
    fmt = get_format(2, 1)
    out = np.asarray(cast_to_fp(jnp.asarray(grid), fmt))
    np.testing.assert_array_equal(out, grid)
    # Midpoints round to nearest even mantissa; saturation at +-6.
    cases = {
        0.24: 0.0,  # below subnormal midpoint 0.25 -> 0
        0.26: 0.5,
        1.24: 1.0,
        1.26: 1.5,
        2.4: 2.0,
        2.6: 3.0,
        5.1: 6.0,
        100.0: 6.0,
        -7.0: -6.0,
        2.5: 2.0,  # tie -> even (2.0 has even mantissa code)
        1.25: 1.0,  # tie -> even
    }
    x = jnp.asarray(list(cases.keys()), jnp.float32)
    np.testing.assert_allclose(np.asarray(cast_to_fp(x, fmt)), list(cases.values()))


def test_e4m3_matches_native():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32) * 100
    fmt = get_format(4, 3)
    out = np.asarray(cast_to_fp(jnp.asarray(x), fmt))
    ref = np.clip(x, -448, 448).astype(jnp.float8_e4m3fn).astype(np.float32)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("ename", ["e2m1", "e3m2", "e2m3", "e5m2", "e3m4"])
def test_numpy_parity(ename, rng):
    fmt = parse_format(ename)
    x = (rng.standard_normal(8192) * fmt.maxval).astype(np.float32)
    x[:16] = [0, -0, 1e-30, -1e-30, fmt.maxval, -fmt.maxval, fmt.maxval * 2,
              -fmt.maxval * 2, 0.5, -0.5, 1.0, -1.0, 3.3, -3.3, 1e8, -1e8]
    ref = cast_to_fp_numpy(x, fmt)
    if ename == "e5m2":
        native = np.clip(x, -fmt.maxval, fmt.maxval).astype(jnp.float8_e5m2).astype(np.float32)
        np.testing.assert_array_equal(ref, native)
    out = np.asarray(cast_to_fp(jnp.asarray(x), fmt))
    np.testing.assert_array_equal(out, ref)


def test_e8m0_powers_of_two(rng):
    fmt = parse_format("e8m0")
    x = np.abs(rng.standard_normal(1024)).astype(np.float32) * 1000
    out = np.asarray(cast_to_fp(jnp.asarray(x), fmt))
    # Every output is a power of two
    e = np.log2(out)
    np.testing.assert_allclose(e, np.round(e))
    np.testing.assert_array_equal(out, cast_to_fp_numpy(x, fmt))
