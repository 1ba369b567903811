"""Pre-flight HBM guard (runtime/hbm_guard.py): the round-4 wedge class — first-compiling
a monolithic scoring graph whose peak HBM exceeds the chip (measured: 96 triplets at 512px
-> 21.05 GB vs 15.75 GB) — must be rejected or auto-chunked ON THE HOST, before any graph
is built or any device is touched."""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

from diffsim_tpu.runtime import hbm_guard
from diffsim_tpu.runtime.device_cache import resolve_cached_chunk
from diffsim_tpu.runtime.hbm_guard import HbmBudgetError


def _fake_scorer(img_size=512, hbm_scale=1.0, params=None):
    return SimpleNamespace(params=params or {}, img_size=img_size, hbm_scale=hbm_scale,
                           _moment_cache=None)


def test_per_triplet_estimate_scales_with_resolution_and_backbone():
    base = hbm_guard.per_triplet_bytes(512)
    assert base == hbm_guard.PER_TRIPLET_BYTES_512
    assert hbm_guard.per_triplet_bytes(1024) == pytest.approx(4 * base)
    assert hbm_guard.per_triplet_bytes(512, hbm_scale=1.7) == pytest.approx(1.7 * base)


def test_budget_env_override_and_disable(monkeypatch):
    monkeypatch.setenv("DIFFSIM_TPU_HBM_GB", "31.5")
    assert hbm_guard.budget_bytes() == pytest.approx(31.5e9)
    monkeypatch.setenv("DIFFSIM_TPU_HBM_GB", "0")
    assert hbm_guard.max_triplets(_fake_scorer()) is None  # guard disabled
    hbm_guard.check_chunk(_fake_scorer(), 10_000)  # no raise when disabled


def test_round4_incident_shape_is_refused_on_host(monkeypatch):
    """The exact wedge: an explicit 96-triplet graph at 512px against the 15.75 GB default
    budget. Estimate (~20 GB with zero params) exceeds it -> HbmBudgetError from pure host
    arithmetic; nothing is compiled, no device is initialized."""
    monkeypatch.delenv("DIFFSIM_TPU_HBM_GB", raising=False)
    with pytest.raises(HbmBudgetError, match="96-triplet graph at 512px"):
        resolve_cached_chunk(None, 96, 96, 512, scorer=_fake_scorer())
    # and the auto policy dispatches the same T=96 safely instead
    step, n = resolve_cached_chunk(None, 96, None, 512, scorer=_fake_scorer())
    assert step <= 24 and n % step == 0
    est = hbm_guard.scorer_static_bytes(_fake_scorer()) + step * hbm_guard.per_triplet_bytes(512)
    assert est <= hbm_guard.budget_bytes() * hbm_guard.MARGIN


def test_auto_chunk_capped_by_budget_below_heuristic(monkeypatch):
    """A tight budget caps the auto chunk BELOW the known-good-24 heuristic."""
    sc = _fake_scorer()
    # budget that fits exactly 5 triplets above static
    per = hbm_guard.per_triplet_bytes(512)
    budget = (hbm_guard.scorer_static_bytes(sc) + 5.5 * per) / hbm_guard.MARGIN
    monkeypatch.setenv("DIFFSIM_TPU_HBM_GB", str(budget / 1e9))
    assert hbm_guard.max_triplets(sc) == 5
    step, n = resolve_cached_chunk(None, 200, None, 512, scorer=sc)
    assert step == 5 and n == 200
    # a mesh quantum floors the cap to a quantum multiple
    mesh = SimpleNamespace()  # resolve only consults data_axis_size via meshlib
    from diffsim_tpu.parallel import mesh as meshlib

    class FakeMesh:
        shape = {"data": 4, "model": 1}

    assert meshlib.data_axis_size(FakeMesh()) == 4
    step, n = resolve_cached_chunk(FakeMesh(), 200, None, 512, scorer=sc)
    assert step == 4 and n % 4 == 0


def test_fresh_batch_argument_residency_budgeted(monkeypatch):
    """Chunking bounds activations but NOT input buffers (the scan program takes the whole
    padded batch; the XL/DiT loops enqueue every chunk's transfer before the first fetch).
    A batch whose pixel arguments alone exceed HBM must be refused outright — auto-chunking
    cannot save it."""
    monkeypatch.delenv("DIFFSIM_TPU_HBM_GB", raising=False)
    sc = _fake_scorer()
    # NIGHTS-scale fresh batch at f32 transport: 2120 * 3 * 512^2 * 3 * 4 B ~= 20 GB of
    # arguments against the 15.75 GB default budget
    with pytest.raises(HbmBudgetError, match="resident pixel arguments"):
        resolve_cached_chunk(None, 2120, None, 512, scorer=sc, arg_itemsize=4)
    # the same batch in uint8 transport (~5 GB of arguments) fits with auto-chunking
    step, n = resolve_cached_chunk(None, 2120, None, 512, scorer=sc, arg_itemsize=1)
    assert step <= 24 and n >= 2120
    # and the cached path (slot-index arguments) is unaffected at any T
    step, n = resolve_cached_chunk(None, 2120, None, 512, scorer=sc)
    assert step <= 24


def test_budget_too_small_for_mesh_quantum_raises(monkeypatch):
    sc = _fake_scorer()
    per = hbm_guard.per_triplet_bytes(512)
    budget = (hbm_guard.scorer_static_bytes(sc) + 2.5 * per) / hbm_guard.MARGIN
    monkeypatch.setenv("DIFFSIM_TPU_HBM_GB", str(budget / 1e9))

    class FakeMesh:
        shape = {"data": 4, "model": 1}

    with pytest.raises(HbmBudgetError, match="minimal 4-triplet"):
        resolve_cached_chunk(FakeMesh(), 16, None, 512, scorer=sc)


def test_static_bytes_counts_params_and_pool():
    params = {"w": np.zeros((1000, 1000), np.float32)}  # 4 MB
    sc = _fake_scorer(params=params)
    base = hbm_guard.scorer_static_bytes(_fake_scorer())
    assert hbm_guard.scorer_static_bytes(sc) == pytest.approx(base + 4e6)
    sc._moment_cache = SimpleNamespace(pool=np.zeros((100, 100), np.float32))
    assert hbm_guard.scorer_static_bytes(sc) == pytest.approx(base + 4e6 + 4e4)


# ----------------------------------------------------------------------
# end-to-end on a tiny scorer (CPU): the fresh triplet path auto-chunks under a tight
# budget without ever building the monolithic graph, and refuses an explicit over-budget
# chunk before any compile
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_scorer():
    from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15
    from diffsim_tpu.models import clip_text, unet, vae

    return DiffSimSD15(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )


def _pix(seed, n):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (n, 32, 32, 3)).astype(np.float32)


def test_fresh_triplet_path_autochunks_under_budget(tiny_scorer, monkeypatch):
    a, b, c = _pix(1, 8), _pix(2, 8), _pix(3, 8)
    kw = dict(prompt="p", target_step=600)

    # reference result: default budget, monolithic graph
    ref_ab, ref_ac = tiny_scorer.score_triplet_batch(a, b, c, **kw)

    # budget that fits only 4 tiny triplets -> auto-chunked scan; the monolithic
    # _triplet_fn must never be consulted
    per = hbm_guard.per_triplet_bytes(32)
    budget = (hbm_guard.scorer_static_bytes(tiny_scorer) + 4.5 * per) / hbm_guard.MARGIN
    monkeypatch.setenv("DIFFSIM_TPU_HBM_GB", str(budget / 1e9))
    assert hbm_guard.max_triplets(tiny_scorer) == 4
    monkeypatch.setattr(
        tiny_scorer, "_triplet_fn",
        lambda *a_, **k_: pytest.fail("monolithic graph built despite HBM guard"),
    )
    g_ab, g_ac = tiny_scorer.score_triplet_batch(a, b, c, **kw)
    np.testing.assert_allclose(ref_ab, g_ab, atol=2e-6)
    np.testing.assert_allclose(ref_ac, g_ac, atol=2e-6)


def test_pair_path_refused_over_budget(tiny_scorer, monkeypatch):
    """score_batch (no scan dispatch) refuses an over-budget P outright, pre-compile;
    a pair costs 2/3 of a triplet in the estimate."""
    per_pair = hbm_guard.per_triplet_bytes(32) * (2 / 3)
    budget = (hbm_guard.scorer_static_bytes(tiny_scorer) + 4.5 * per_pair) / hbm_guard.MARGIN
    monkeypatch.setenv("DIFFSIM_TPU_HBM_GB", str(budget / 1e9))
    a, b = _pix(7, 8), _pix(8, 8)
    with pytest.raises(HbmBudgetError, match="8-pair graph at 32px"):
        tiny_scorer.score_batch(a, b, prompt="p", target_step=600)
    # within budget still scores
    s = tiny_scorer.score_batch(a[:4], b[:4], prompt="p", target_step=600)
    assert s.shape == (4,)


def test_fresh_triplet_explicit_oversize_chunk_refused_precompile(tiny_scorer, monkeypatch):
    a, b, c = _pix(4, 8), _pix(5, 8), _pix(6, 8)
    per = hbm_guard.per_triplet_bytes(32)
    budget = (hbm_guard.scorer_static_bytes(tiny_scorer) + 4.5 * per) / hbm_guard.MARGIN
    monkeypatch.setenv("DIFFSIM_TPU_HBM_GB", str(budget / 1e9))
    monkeypatch.setattr(
        tiny_scorer, "_triplet_fn",
        lambda *a_, **k_: pytest.fail("graph built for a refused chunk"),
    )
    monkeypatch.setattr(
        tiny_scorer, "_triplet_scan_fn",
        lambda *a_, **k_: pytest.fail("graph built for a refused chunk"),
    )
    with pytest.raises(HbmBudgetError, match="8-triplet graph at 32px"):
        tiny_scorer.score_triplet_batch(a, b, c, prompt="p", target_step=600, chunk=8)
