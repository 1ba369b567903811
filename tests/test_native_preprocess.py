"""Native C++ resampler: bit-exact parity with PIL's 8bpc lanczos."""

import numpy as np
import pytest
from PIL import Image

from diffsim_tpu import native


@pytest.fixture(scope="module")
def has_lib():
    if native.lib() is None:
        pytest.skip("native toolchain unavailable; PIL fallback covers this path")
    return True


@pytest.mark.parametrize(
    "in_shape,out_shape",
    [
        ((600, 800), (512, 512)),  # downscale, non-square source
        ((100, 50), (224, 224)),  # upscale
        ((512, 512), (512, 512)),  # identity size (still resampled)
        ((37, 53), (64, 48)),  # odd sizes, mixed direction
        ((2000, 1500), (512, 512)),  # heavy downscale (wide windows)
        ((8, 8), (512, 512)),  # extreme upscale
    ],
)
def test_bit_exact_vs_pil(has_lib, in_shape, out_shape):
    rng = np.random.default_rng(hash(in_shape) % 2**31)
    src = rng.integers(0, 256, (*in_shape, 3), dtype=np.uint8)
    oh, ow = out_shape
    ref = np.asarray(Image.fromarray(src).resize((ow, oh), Image.LANCZOS))
    got = native.resize_lanczos_u8(src, oh, ow)
    np.testing.assert_array_equal(got, ref)


def test_single_channel_exact(has_lib):
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (64, 48), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(src, "L").resize((32, 32), Image.LANCZOS))
    got = native.resize_lanczos_u8(src[..., None], 32, 32)[..., 0]
    np.testing.assert_array_equal(got, ref)


def test_four_channel_is_channel_independent(has_lib):
    """The kernel resamples channels independently (PIL premultiplies alpha for RGBA, so
    RGBA is NOT the supported contract — each plane matches its own L-mode resize)."""
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (64, 48, 4), dtype=np.uint8)
    got = native.resize_lanczos_u8(src, 32, 32)
    for c in range(4):
        ref = np.asarray(Image.fromarray(src[..., c], "L").resize((32, 32), Image.LANCZOS))
        np.testing.assert_array_equal(got[..., c], ref)


def test_process_image_u8_uses_same_pixels():
    """The loader path must produce identical pixels whichever resampler ran."""
    from diffsim_tpu.core.image import process_image_u8

    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 256, (123, 77, 3), dtype=np.uint8))
    out = process_image_u8(img, 64)
    ref = np.asarray(img.convert("RGB").resize((64, 64), Image.LANCZOS))[None]
    np.testing.assert_array_equal(out, ref)


def test_invalid_args_return_none(has_lib):
    lib = native.lib()
    rc = lib.resize_lanczos_u8(None, 10, 10, 3, None, 5, 5)
    assert rc == 1
