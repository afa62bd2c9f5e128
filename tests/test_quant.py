"""Golden tests for the wire codec vs the reference formulas.

Reference semantics under test (compute/quantization.go):
  - 8-byte little-endian f32 [min][max] header (quantization.go:71-80)
  - range folded from 0 so it always includes 0 (quantization.go:182-216)
  - truncating uint8(normalized*255) (quantization.go:8-19)
  - dequant v = min + (q/255)(max-min) (quantization.go:47-53)
"""
import struct

import numpy as np
import pytest

from vectorsearch_tpu.quant import codec, layout


def go_quantize_vector_f32(vec):
    """Literal transcription of QuantizeVectorFloat32's arithmetic in Python."""
    vmin, vmax = np.float32(0), np.float32(0)
    for v in vec:
        v = np.float32(v)
        if v < vmin:
            vmin = v
        if v > vmax:
            vmax = v
    out = bytearray(struct.pack("<ff", vmin, vmax))
    for v in vec:
        v = np.float32(min(max(v, vmin), vmax))
        if vmax - vmin == 0:
            q = 0
        else:
            normalized = np.float32(v - vmin) / np.float32(vmax - vmin)
            q = int(np.float32(normalized * np.float32(255)))  # trunc toward 0
        out.append(q)
    return np.frombuffer(bytes(out), dtype=np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wire_parity_with_go_formula(seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=64).astype(np.float32)
    ours = codec.quantize(v)
    golden = go_quantize_vector_f32(v)
    np.testing.assert_array_equal(ours, golden)


def test_all_positive_range_includes_zero():
    # rangeFloat starts at 0, so an all-positive vector gets min == 0.
    v = np.array([0.5, 1.0, 2.0], dtype=np.float32)
    wire = codec.quantize(v)
    vmin, vmax = codec.parse_header(wire)
    assert vmin == 0.0
    assert vmax == np.float32(2.0)


def test_all_negative_range_includes_zero():
    v = np.array([-0.5, -1.0, -2.0], dtype=np.float32)
    wire = codec.quantize(v)
    vmin, vmax = codec.parse_header(wire)
    assert vmax == 0.0
    assert vmin == np.float32(-2.0)


def test_zero_vector():
    v = np.zeros(16, dtype=np.float32)
    wire = codec.quantize(v)
    assert (codec.payload(wire) == 0).all()
    np.testing.assert_array_equal(codec.dequantize(wire), v)


def test_truncation_not_rounding():
    # value chosen so normalized*255 = 254.99..; rounding would give 255.
    vmin, vmax = -1.0, 1.0
    value = vmin + (254.999 / 255) * (vmax - vmin)
    q = codec.quantize_scalar(value, vmin, vmax)
    assert q == 254


def test_roundtrip_accuracy():
    rng = np.random.default_rng(7)
    v = rng.normal(size=(100, 768)).astype(np.float32)
    wire = codec.quantize(v)
    back = codec.dequantize(wire)
    span = v.max(axis=-1, keepdims=True) - np.minimum(v.min(axis=-1, keepdims=True), 0)
    # max error is one quantization step
    assert (np.abs(back - v) <= span / 255 + 1e-6).all()


def test_header_is_float32_even_for_float64_input():
    v = np.array([0.1, -0.2, 0.3], dtype=np.float64)
    wire = codec.quantize(v)
    vmin, vmax = codec.parse_header(wire)
    assert vmin.dtype == np.float32 and vmax.dtype == np.float32
    assert vmin == np.float32(-0.2)


def test_batch_matches_per_row():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(10, 32)).astype(np.float32)
    batch = codec.quantize(v)
    rows = np.stack([codec.quantize(row) for row in v])
    np.testing.assert_array_equal(batch, rows)


def test_pack_unpack_matches_dequantize():
    rng = np.random.default_rng(4)
    v = rng.normal(size=(50, 128)).astype(np.float32)
    wire = codec.quantize(v)
    packed = layout.pack_wire(wire)
    np.testing.assert_allclose(
        layout.unpack(packed), codec.dequantize(wire), rtol=1e-5, atol=1e-6
    )


def test_pack_to_wire_roundtrip():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(20, 64)).astype(np.float32)
    wire = codec.quantize(v)
    packed = layout.pack_wire(wire)
    back = layout.to_wire(packed)
    # payload must be byte-exact; header f32 reconstruction may differ by
    # ~1 ulp from scale/offset recombination, so compare dequantized values.
    np.testing.assert_array_equal(codec.payload(back), codec.payload(wire))
    np.testing.assert_allclose(
        codec.dequantize(back), codec.dequantize(wire), rtol=1e-4, atol=1e-6
    )


def test_noop_style_wire_rows():
    # The noop embedder emits min=-1, max=1 headers with raw random payload
    # (reference: noop/ai.go:53-61). Make sure pack_wire handles such rows.
    rng = np.random.default_rng(6)
    rows = np.empty((4, 8 + 512), dtype=np.uint8)
    rows[:, :8] = np.frombuffer(struct.pack("<ff", -1.0, 1.0), np.uint8)
    rows[:, 8:] = rng.integers(0, 256, size=(4, 512), dtype=np.uint8)
    packed = layout.pack_wire(rows)
    deq = codec.dequantize(rows)
    np.testing.assert_allclose(layout.unpack(packed), deq, rtol=1e-5, atol=1e-6)
    norms = np.linalg.norm(deq, axis=-1)
    np.testing.assert_allclose(
        np.asarray(packed.inv_norm), 1.0 / norms, rtol=1e-5
    )


def test_inv_norm_zero_for_zero_vector():
    packed = layout.pack_float(np.zeros((1, 16), np.float32))
    assert np.asarray(packed.inv_norm)[0] == 0.0
