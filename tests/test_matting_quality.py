"""Regression-pins the matting stand-in quality on the synthetic known-foreground fixture
(tools/matting_eval.py): mask IoU per failure category and the FFA pooling's sensitivity to
matting errors. The numbers (committed in README's parity notes) quantify how far the
heuristic sits from a perfect matte — the reference's carvekit engine
(/root/reference/metrics/foreground_feature_averaging.py:20-29) cannot run here, so perfect
(ground-truth) matting is the comparison anchor."""

import dataclasses

import numpy as np
import pytest

from tools import matting_eval as ME


@pytest.fixture(scope="module")
def table():
    from diffsim_tpu.metrics.ffa import ForegroundFeatureAveraging, heuristic_matting
    from diffsim_tpu.models.dinov2 import DinoConfig

    ffa = ForegroundFeatureAveraging(cfg=dataclasses.replace(DinoConfig.tiny(), patch=14))
    return ME.evaluate(heuristic_matting, ffa)


def test_fixture_is_deterministic():
    a = ME.make_fixture(0)
    b = ME.make_fixture(0)
    assert len(a) == len(ME.CATEGORIES) * ME.PER_CAT == 20
    for (ca, ia, ma), (cb, ib, mb) in zip(a, b):
        assert ca == cb
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_array_equal(ma, mb)


def test_heuristic_matting_quality_pins(table):
    """Measured means (slack ~20% below) — a regression in heuristic_matting or the FFA mask
    path moves these."""
    # measured (tools/matting_eval.py): centered 1.000, textured_bg 0.769,
    # low_contrast 0.493, border 0.857 (after center-prior inversion detection;
    # 0.000 with center_prior=False — the raw border statistics are object-poisoned)
    assert table["centered"]["iou"] >= 0.9, table
    assert table["textured_bg"]["iou"] >= 0.6, table
    assert table["low_contrast"]["iou"] >= 0.35, table
    assert table["border"]["iou"] >= 0.5, table


def test_center_prior_detects_and_inverts_border_failure():
    """The border-dominant blind spot (round-3 parity note: IoU 0.000) is auto-detected from
    the matte's own statistics and inverted, with a per-image warning; opting out reproduces
    the raw (failing) behavior."""
    import warnings

    from diffsim_tpu.metrics.ffa import heuristic_matting

    for cat, img, gt in ME.make_fixture(0):
        if cat != "border":
            continue
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            fixed = (np.asarray(heuristic_matting(img))[..., 3] > 0).astype(np.uint8)
        assert any("inverted" in str(x.message) for x in w), "no per-image warning"
        raw = (np.asarray(heuristic_matting(img, center_prior=False))[..., 3] > 0).astype(np.uint8)
        assert ME.iou(raw, gt) <= 0.1, "fixture no longer exercises the blind spot"
        assert ME.iou(fixed, gt) >= 0.5, (ME.iou(fixed, gt), "inversion did not recover")


def test_center_prior_leaves_good_mattes_alone():
    """Non-border categories must produce NO inversion warnings and identical mattes with
    and without the prior."""
    import warnings

    from diffsim_tpu.metrics.ffa import heuristic_matting

    for cat, img, gt in ME.make_fixture(0):
        if cat == "border":
            continue
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            a = np.asarray(heuristic_matting(img))
        assert not w, (cat, [str(x.message) for x in w])
        b = np.asarray(heuristic_matting(img, center_prior=False))
        np.testing.assert_array_equal(a, b)


def test_pooling_sensitivity_tracks_mask_quality(table):
    """Where masks are good, the Crop-Feat readout barely moves (delta << 1); where they are
    bad (border), it moves more — i.e., CUTE-baseline accuracy IS sensitive to the matting
    stand-in exactly where the masks degrade."""
    assert table["centered"]["delta"] is not None
    assert table["centered"]["delta"] < 0.1, table
    assert table["border"]["delta"] >= table["centered"]["delta"], table
