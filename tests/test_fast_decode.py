"""--fast_decode: opt-in DCT-domain JPEG decode (core.image.load_image draft path).

Contract: for a large JPEG the fast path must decode to the same scene within JPEG-scale
error (it is a different decode, not a different image) while the default path stays
bit-identical to the reference pipeline; non-JPEG inputs are untouched by the flag."""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

from diffsim_tpu.core.image import ImageLoader, load_and_process_u8


@pytest.fixture(scope="module")
def big_jpeg(tmp_path_factory):
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:2048, 0:2048].astype(np.float32)
    img = np.stack([
        120 + 100 * np.sin(2 * np.pi * 3 * xx / 2048),
        128 + 90 * np.cos(2 * np.pi * 2 * yy / 2048),
        110 + 80 * np.sin(2 * np.pi * (xx + yy) / 2048),
    ], axis=-1) + rng.normal(0, 4, (2048, 2048, 3))
    p = tmp_path_factory.mktemp("fd") / "big.jpg"
    Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(p, quality=92)
    return str(p)


def test_fast_decode_close_but_distinct_on_large_jpeg(big_jpeg):
    exact = load_and_process_u8(big_jpeg, 512)
    fast = load_and_process_u8(big_jpeg, 512, fast_decode=True)
    assert exact.shape == fast.shape == (1, 512, 512, 3)
    # same scene: mean abs error well under JPEG block-noise scale...
    err = np.abs(exact.astype(np.float32) - fast.astype(np.float32))
    assert err.mean() < 4.0, err.mean()
    # ...but a genuinely different decode (the draft path actually engaged)
    assert err.max() > 0


def test_fast_decode_noop_on_png_and_small_jpeg(tmp_path):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    png = tmp_path / "x.png"
    Image.fromarray(arr).save(png)
    np.testing.assert_array_equal(
        load_and_process_u8(str(png), 128),
        load_and_process_u8(str(png), 128, fast_decode=True),
    )
    # a JPEG already at/below ~2x target has no 1/2+ scale above the draft size -> same pixels
    small = tmp_path / "small.jpg"
    Image.fromarray(arr).save(small, quality=92)
    np.testing.assert_array_equal(
        load_and_process_u8(str(small), 256),
        load_and_process_u8(str(small), 256, fast_decode=True),
    )


def test_loader_fast_decode_flag(big_jpeg):
    exact = ImageLoader(512, cache_mb=0).submit(big_jpeg).result()
    fast = ImageLoader(512, cache_mb=0, fast_decode=True).submit(big_jpeg).result()
    assert exact.shape == fast.shape
    assert np.abs(exact - fast).max() > 0  # the flag reaches the threaded decode path
    assert np.abs(exact - fast).mean() < 4.0 / 127.5  # float [-1,1] scale