"""Native C++ codec: byte-exact parity with the numpy reference path."""
import numpy as np
import pytest

from vectorsearch_tpu import native
from vectorsearch_tpu.quant import codec, layout


@pytest.fixture(scope="module")
def have_native():
    if native.lib() is None:
        pytest.skip("native codec unavailable (no toolchain?)")
    return True


def _numpy_quantize(v):
    import os

    os.environ["VSTPU_NO_NATIVE"] = "1"
    try:
        return codec.quantize(v)
    finally:
        del os.environ["VSTPU_NO_NATIVE"]


def test_quantize_parity(have_native):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(200, 768)).astype(np.float32)
    got = native.quantize_f32(v)
    want = _numpy_quantize(v)
    np.testing.assert_array_equal(got, want)


def test_quantize_edge_cases(have_native):
    cases = [
        np.zeros((3, 16), np.float32),
        np.full((2, 8), 5.0, np.float32),  # all-positive: min folds to 0
        np.full((2, 8), -5.0, np.float32),  # all-negative: max folds to 0
    ]
    for v in cases:
        np.testing.assert_array_equal(native.quantize_f32(v), _numpy_quantize(v))


def test_dequantize_parity(have_native):
    rng = np.random.default_rng(1)
    wire = codec.quantize(rng.normal(size=(100, 256)).astype(np.float32))
    got = native.dequantize_f32(wire)
    import os

    os.environ["VSTPU_NO_NATIVE"] = "1"
    try:
        want = codec.dequantize(wire)
    finally:
        del os.environ["VSTPU_NO_NATIVE"]
    # -O3 FMA contraction can differ by 1 ulp from the numpy path
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=5e-7)


def test_pack_wire_parity(have_native):
    import os

    rng = np.random.default_rng(2)
    wire = codec.quantize(rng.normal(size=(100, 256)).astype(np.float32))
    got = native.pack_wire(wire)
    os.environ["VSTPU_NO_NATIVE"] = "1"
    try:
        want = layout.pack_wire(wire)
    finally:
        del os.environ["VSTPU_NO_NATIVE"]
    np.testing.assert_array_equal(got[0], np.asarray(want.codes))
    np.testing.assert_allclose(got[1], np.asarray(want.scale), rtol=1e-6)
    np.testing.assert_allclose(got[2], np.asarray(want.offset), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got[3], np.asarray(want.inv_norm), rtol=1e-5)
