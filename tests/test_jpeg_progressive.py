"""Progressive JPEG (SOF2) codec tests.

The invariant under test: a progressive stream carries the SAME
quantised DCT coefficients as the baseline stream of the same image at
the same quality — the entropy coding differs, the data does not — so
``decode_jpeg(progressive)`` must equal ``decode_jpeg(baseline)``
PIXEL-FOR-PIXEL (not approximately). That exercises every decode path
(DC/AC first passes, successive-approximation refinement, EOB runs,
ZRL-with-correction-bits, restart markers, interleaved and
non-interleaved scan geometry) without any codec library. No Ray.
"""

import numpy as np
import pytest

from osm_sidewalkreator_ray.stages.jpeg import decode_jpeg, encode_jpeg
from osm_sidewalkreator_ray.stages.jpeg_progressive import (
    SCRIPT_COLOR, SCRIPT_GRAY, encode_jpeg_progressive, optimal_huffman)


def _noise(shape, seed=0):
    return np.random.RandomState(seed).randint(0, 256, shape,
                                               dtype=np.uint8)


def _photoish(h, w):
    g = 128 + 60 * np.sin(np.add.outer(np.arange(h) / 5.0,
                                       np.arange(w) / 7.0))
    return g[..., None].repeat(3, axis=2).astype(np.uint8)


class TestProgressiveEqualsBaseline:
    @pytest.mark.parametrize("shape,sub", [
        ((24, 31, 3), "444"),
        ((33, 47, 3), "420"),
        ((8, 8, 3), "420"),
        ((64, 64, 3), "444"),
    ])
    def test_color_identity(self, shape, sub):
        img = _noise(shape, seed=1)
        base = decode_jpeg(encode_jpeg(img, 75, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, 75, subsample=sub))
        assert np.array_equal(base, prog)

    def test_grayscale_identity(self):
        img = _noise((41, 29), seed=2)
        base = decode_jpeg(encode_jpeg(img, 75))
        prog = decode_jpeg(encode_jpeg_progressive(img, 75))
        assert np.array_equal(base, prog)

    @pytest.mark.parametrize("q", [10, 50, 92])
    def test_quality_sweep_noise(self, q):
        # dense coefficients: heavy refinement-correction traffic
        img = _noise((40, 56, 3), seed=3)
        base = decode_jpeg(encode_jpeg(img, q, subsample="420"))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, q, subsample="420"))
        assert np.array_equal(base, prog)

    def test_flat_image_long_eob_runs(self):
        img = np.full((128, 160, 3), 173, np.uint8)
        base = decode_jpeg(encode_jpeg(img, 75))
        prog = decode_jpeg(encode_jpeg_progressive(img, 75))
        assert np.array_equal(base, prog)

    def test_hot_pixel_isolated_block(self):
        # one detailed block inside a large EOB run on both sides
        img = np.full((96, 96, 3), 40, np.uint8)
        img[70, 70] = 255
        base = decode_jpeg(encode_jpeg(img, 75, subsample="444"))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, 75, subsample="444"))
        assert np.array_equal(base, prog)

    @pytest.mark.parametrize("shape", [(1, 300, 3), (300, 1, 3),
                                       (7, 7), (9, 17, 3)])
    def test_extreme_aspect(self, shape):
        img = _noise(shape, seed=4)
        base = decode_jpeg(encode_jpeg(img, 75))
        prog = decode_jpeg(encode_jpeg_progressive(img, 75))
        assert np.array_equal(base, prog)


# a deliberately deep script: Al=3 first passes, three refinement
# rounds per band, narrow spectral slices — worst case for the
# EOB-run + correction-bit bookkeeping
DEEP_SCRIPT = [
    ((0, 1, 2), 0, 0, 0, 3),
    ((0,), 1, 2, 0, 3), ((0,), 3, 9, 0, 3), ((0,), 10, 63, 0, 3),
    ((1,), 1, 63, 0, 3), ((2,), 1, 63, 0, 3),
    ((0, 1, 2), 0, 0, 1, 2), ((0, 1, 2), 0, 0, 1, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 2, 3, 2), ((0,), 3, 9, 3, 2), ((0,), 10, 63, 3, 2),
    ((1,), 1, 63, 3, 2), ((2,), 1, 63, 3, 2),
    ((0,), 1, 2, 2, 1), ((0,), 3, 9, 2, 1), ((0,), 10, 63, 2, 1),
    ((1,), 1, 63, 2, 1), ((2,), 1, 63, 2, 1),
    ((0,), 1, 2, 1, 0), ((0,), 3, 9, 1, 0), ((0,), 10, 63, 1, 0),
    ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0),
]


class TestScanScripts:
    @pytest.mark.parametrize("sub", ["444", "420"])
    def test_deep_successive_approximation(self, sub):
        for seed, mk in [(5, lambda: _noise((50, 77, 3), 5)),
                         (0, lambda: _photoish(50, 77))]:
            img = mk()
            base = decode_jpeg(encode_jpeg(img, 60, subsample=sub))
            prog = decode_jpeg(encode_jpeg_progressive(
                img, 60, subsample=sub, scans=DEEP_SCRIPT))
            assert np.array_equal(base, prog)

    def test_default_scripts_are_standard_shape(self):
        # DC-first rows precede their refinements; every band reaches
        # Al=0 (the "displayable at full precision" invariant)
        for script in (SCRIPT_COLOR, SCRIPT_GRAY):
            finals = {(c, k) for comps, ss, se, ah, al in script
                      if al == 0 for c in comps
                      for k in range(ss, se + 1)}
            ncomp = max(max(c) for c, *_ in script) + 1
            want = {(c, k) for c in range(ncomp) for k in range(64)}
            assert finals == want


class TestRestartMarkers:
    @pytest.mark.parametrize("ri", [1, 2, 7])
    def test_progressive_restart_identity(self, ri):
        img = _noise((40, 56, 3), seed=6)
        base = decode_jpeg(encode_jpeg(img, 70, subsample="420"))
        prog = decode_jpeg(encode_jpeg_progressive(
            img, 70, subsample="420", restart_interval=ri))
        assert np.array_equal(base, prog)

    def test_restart_gray_single_component(self):
        # non-interleaved geometry: restart counts data units
        img = _noise((33, 33), seed=7)
        base = decode_jpeg(encode_jpeg(img, 70))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, 70, restart_interval=3))
        assert np.array_equal(base, prog)


class TestOptimalHuffman:
    def test_kraft_and_completeness(self):
        rng = np.random.RandomState(8)
        for _ in range(20):
            freq = np.zeros(256, dtype=np.int64)
            n = rng.randint(1, 60)
            syms = rng.choice(256, size=n, replace=False)
            freq[syms] = rng.randint(1, 10_000, size=n)
            bits, vals = optimal_huffman(freq)
            assert sorted(vals) == sorted(syms.tolist())
            assert sum(bits) == n
            kraft = sum(c * 2.0 ** -(i + 1) for i, c in enumerate(bits))
            assert kraft <= 1.0 + 1e-12
            assert all(c >= 0 for c in bits)

    def test_single_symbol_gets_one_bit(self):
        freq = np.zeros(256, dtype=np.int64)
        freq[42] = 1000
        bits, vals = optimal_huffman(freq)
        assert vals == [42]
        assert bits[0] == 1  # one code of length 1

    def test_progressive_usually_smaller(self):
        # optimal per-scan tables should beat the fixed Annex K
        # baseline tables on a typical smooth image
        img = _photoish(64, 96)
        base = encode_jpeg(img, 75, subsample="420")
        prog = encode_jpeg_progressive(img, 75, subsample="420")
        assert len(prog) < len(base)


class TestPlugPoints:
    def test_arithmetic_still_raises(self):
        img = _noise((16, 16), seed=9)
        data = bytearray(encode_jpeg_progressive(img, 75))
        i = data.find(bytes([0xFF, 0xC2]))
        data[i + 1] = 0xCA  # SOF10: progressive arithmetic
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))
