"""Device-resident feature cache (runtime.device_cache) + the cached scoring path.

The reference re-reads, re-preprocesses and re-encodes every image on every score call
(/root/reference/diffsim/diffsim.py:103-106) even though every 2AFC protocol reuses images
heavily (/root/reference/cute_main.py:54-106 draws 10 experiments per class from the same
dirs). The cache uploads + VAE-encodes each unique image once; these tests pin (a) the LRU
slot bookkeeping, (b) bit-parity of cached scores with the fresh-encode path, and (c) the
CLI wiring end-to-end.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15
from diffsim_tpu.models import clip_text, unet, vae
from diffsim_tpu.parallel import mesh as meshlib
from diffsim_tpu.runtime.device_cache import DeviceFeatureCache

# ---------------------------------------------------------------------------
# unit: LRU bookkeeping over a plain-numpy "device" pool
# ---------------------------------------------------------------------------


def _np_cache(capacity, row_shape=(2,)):
    pool = np.zeros((capacity,) + row_shape, np.float32)

    calls = []

    def update(pool, rows, slots):
        calls.append((rows.shape[0], list(slots)))
        out = pool.copy()
        out[slots] = rows  # duplicate slots carry identical rows: order-independent
        return out

    return DeviceFeatureCache(pool, update, capacity), calls


def _rows_for(missing):
    # deterministic row content derived from the key so reads are checkable
    return np.stack([np.full(2, float(hash(k) % 997), np.float32) for k in missing])


def test_ensure_assigns_hits_and_misses():
    cache, calls = _np_cache(4)
    slots = cache.ensure(["a", "b", "a"], _rows_for)
    assert slots.shape == (3,) and slots.dtype == np.int32
    assert slots[0] == slots[2] != slots[1]
    assert cache.misses == 2 and cache.hits == 1
    # every pool row equals its key's content
    np.testing.assert_array_equal(cache.pool[slots[0]], _rows_for(["a"])[0])
    np.testing.assert_array_equal(cache.pool[slots[1]], _rows_for(["b"])[0])
    # second call: all hits, pool untouched
    n_calls = len(calls)
    slots2 = cache.ensure(["b", "a"], _rows_for)
    assert list(slots2) == [slots[1], slots[0]]
    assert len(calls) == n_calls and cache.evictions == 0


def test_lru_evicts_oldest_unpinned():
    cache, _ = _np_cache(3)
    s_abc = cache.ensure(["a", "b", "c"], _rows_for)
    # touch "a" so "b" is the LRU victim
    cache.ensure(["a"], _rows_for)
    s_d = cache.ensure(["d"], _rows_for)
    assert cache.evictions == 1
    assert s_d[0] == s_abc[1]  # took b's slot
    # b re-misses; a and c are still resident at their old slots
    s2 = cache.ensure(["a", "c"], _rows_for)
    assert list(s2) == [s_abc[0], s_abc[2]]
    assert cache.misses == 4  # a, b, c, d (b was evicted but never re-requested)


def test_keys_of_current_batch_are_pinned():
    cache, _ = _np_cache(3)
    cache.ensure(["a", "b", "c"], _rows_for)
    # a batch referencing a + two new keys must never evict a to place them
    slots = cache.ensure(["a", "d", "e"], _rows_for)
    again = cache.ensure(["a"], _rows_for)
    assert again[0] == slots[0] and cache.misses == 5


def test_batch_larger_than_capacity_raises():
    cache, _ = _np_cache(2)
    with pytest.raises(ValueError, match="unique images"):
        cache.ensure(["a", "b", "c"], _rows_for)


def test_scatter_bucket_padding_is_idempotent():
    """Upload slabs are padded to fixed bucket sizes with repeats of the last row — the
    repeated writes must land identical content (and compile counts stay bounded)."""
    cache, calls = _np_cache(70)
    keys = [f"k{i}" for i in range(67)]  # 64-slab + 3 -> padded 4-bucket
    slots = cache.ensure(keys, _rows_for)
    assert sorted(n for n, _ in calls) == [4, 64]
    for k, s in zip(keys, slots):
        np.testing.assert_array_equal(cache.pool[s], _rows_for([k])[0])


# ---------------------------------------------------------------------------
# scorer integration: cached path == fresh-encode path
# ---------------------------------------------------------------------------


def _scorer(mesh=None):
    return DiffSimSD15(
        unet_cfg=unet.UNetConfig.tiny(),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        img_size=32,
        dtype=np.float32,
        mesh=mesh,
    )


def _image_files(tmp_path, n, size=40):
    rng = np.random.default_rng(1234)
    paths = []
    for i in range(n):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.integers(0, 256, (size, size, 3)).astype(np.uint8)).save(p)
        paths.append(str(p))
    return paths


def test_score_triplet_paths_matches_fresh_encode(tmp_path):
    from diffsim_tpu.core.image import load_and_process_u8

    scorer = _scorer()
    paths = _image_files(tmp_path, 6)
    pa, pb, pc = paths[0:2], paths[2:4], paths[4:6]
    kw = dict(prompt="p", target_step=600, similarity="cosine")
    s_ab, s_ac = scorer.score_triplet_paths(pa, pb, pc, **kw)
    pix = [np.concatenate([load_and_process_u8(p, 32) for p in role]) for role in (pa, pb, pc)]
    f_ab, f_ac = scorer.score_triplet_batch(*pix, **kw)
    # shared _triplet_tail: only the encode placement differs (pool scatter+gather vs inline)
    np.testing.assert_allclose(s_ab, f_ab, atol=2e-6)
    np.testing.assert_allclose(s_ac, f_ac, atol=2e-6)
    # all-hit rescore is bit-identical and touches no new slots
    cache = scorer._moment_cache
    misses = cache.misses
    s_ab2, s_ac2 = scorer.score_triplet_paths(pa, pb, pc, **kw)
    assert cache.misses == misses and cache.hits >= 6
    np.testing.assert_array_equal(s_ab, s_ab2)
    np.testing.assert_array_equal(s_ac, s_ac2)


def test_score_triplet_paths_repeated_images_share_slots(tmp_path):
    """A appearing in many triplets (the CUTE/IPref pattern) is uploaded once; scores equal
    the fresh path that re-encodes it every time."""
    from diffsim_tpu.core.image import load_and_process_u8

    scorer = _scorer()
    paths = _image_files(tmp_path, 4)
    pa = [paths[0]] * 3
    pb = [paths[1], paths[2], paths[1]]
    pc = [paths[3], paths[3], paths[2]]
    s_ab, s_ac = scorer.score_triplet_paths(pa, pb, pc, prompt="p", target_step=600)
    assert scorer._moment_cache.misses == 4  # unique images only
    pix = [np.concatenate([load_and_process_u8(p, 32) for p in role]) for role in (pa, pb, pc)]
    f_ab, f_ac = scorer.score_triplet_batch(*pix, prompt="p", target_step=600)
    np.testing.assert_allclose(s_ab, f_ab, atol=2e-6)
    np.testing.assert_allclose(s_ac, f_ac, atol=2e-6)


def test_score_triplet_paths_uses_supplied_pixels_without_decode(tmp_path):
    """Rows already decoded by the runner's prefetch feed misses — nonexistent paths prove
    no disk read happens."""
    scorer = _scorer()
    rng = np.random.default_rng(5)
    pix = [rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8) for _ in range(3)]
    fake = [[f"/nonexistent/{r}{i}.png" for i in range(2)] for r in "abc"]
    s_ab, s_ac = scorer.score_triplet_paths(fake[0], fake[1], fake[2], *pix,
                                            prompt="p", target_step=600)
    f_ab, f_ac = scorer.score_triplet_batch(*pix, prompt="p", target_step=600)
    np.testing.assert_allclose(s_ab, f_ab, atol=2e-6)
    np.testing.assert_allclose(s_ac, f_ac, atol=2e-6)


def test_cached_scan_chunks_match_plain(tmp_path):
    scorer = _scorer()
    paths = _image_files(tmp_path, 8)
    pa = [paths[i % 4] for i in range(6)]
    pb = [paths[4 + i % 2] for i in range(6)]
    pc = [paths[6 + i % 2] for i in range(6)]
    kw = dict(prompt="p", target_step=600)
    s_ab, s_ac = scorer.score_triplet_paths(pa, pb, pc, **kw)
    t_ab, t_ac = scorer.score_triplet_paths(pa, pb, pc, chunk=2, **kw)
    np.testing.assert_allclose(s_ab, t_ab, atol=2e-6)
    np.testing.assert_allclose(s_ac, t_ac, atol=2e-6)


def test_cached_path_on_mesh_matches_single_device(tmp_path):
    paths = _image_files(tmp_path, 6)
    pa, pb, pc = paths[0:2], paths[2:4], paths[4:6]
    kw = dict(prompt="p", target_step=600)
    ref = _scorer().score_triplet_paths(pa, pb, pc, **kw)
    got = _scorer(mesh=meshlib.make_mesh(8)).score_triplet_paths(pa, pb, pc, **kw)
    np.testing.assert_allclose(got[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], atol=1e-5)


def test_eviction_under_tiny_budget_rescores_identically(tmp_path):
    """With capacity 128 (the floor) the LRU still produces correct scores under churn —
    keys evicted and re-encoded land the same moments."""
    scorer = _scorer()
    scorer.moment_cache_mb = 1e-9  # floor: 128 slots
    paths = _image_files(tmp_path, 6)
    pa, pb, pc = paths[0:2], paths[2:4], paths[4:6]
    s1 = scorer.score_triplet_paths(pa, pb, pc, prompt="p", target_step=600)
    assert scorer._moment_cache.capacity == 128
    # force eviction of everything, then rescore
    cache = scorer._moment_cache
    cache.ensure([f"fill{i}" for i in range(128)],
                 lambda missing: np.zeros((len(missing), 32, 32, 3), np.uint8))
    assert cache.evictions >= 6
    s2 = scorer.score_triplet_paths(pa, pb, pc, prompt="p", target_step=600)
    np.testing.assert_array_equal(s1[0], s2[0])
    np.testing.assert_array_equal(s1[1], s2[1])


# ---------------------------------------------------------------------------
# CLI wiring: default path is cached; --no_device_cache reproduces it exactly
# ---------------------------------------------------------------------------


def test_cli_cute_device_cache_matches_uncached(tmp_path):
    from diffsim_tpu.cli.main import run_benchmark
    from tests import fixtures

    root = str(tmp_path / "bench")
    os.makedirs(root)
    cute = fixtures.make_cute(root)
    base = [
        "--image_path", cute, "--image_size", "32", "--metric", "diffsim",
        "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
        "--model_scale", "tiny", "--batch_size", "8",
    ]
    rep_c = run_benchmark("cute", base + ["--results", str(tmp_path / "cached.jsonl")])
    rep_u = run_benchmark("cute", base + ["--no_device_cache",
                                          "--results", str(tmp_path / "plain.jsonl")])

    def scores(p):
        return [(json.loads(l)["s_ab"], json.loads(l)["s_ac"]) for l in open(p)]

    cached, plain = scores(tmp_path / "cached.jsonl"), scores(tmp_path / "plain.jsonl")
    assert len(cached) == len(plain) == 40
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain), atol=2e-6)
    assert rep_c.correct == rep_u.correct and rep_c.total == rep_u.total


# ---------------------------------------------------------------------------
# XL and DiT scorers share the cache design: cached path == fresh-encode path
# ---------------------------------------------------------------------------


def _xl_scorer(mesh=None):
    from diffsim_tpu.metrics.diffsim_xl import DiffSimXL

    return DiffSimXL(
        unet_cfg=unet.UNetConfig.tiny_xl(cross_attention_dim=64),
        vae_cfg=vae.VAEConfig.tiny(),
        text_cfg=clip_text.CLIPTextConfig.tiny(),
        text2_cfg=clip_text.CLIPTextConfig(
            vocab_size=1000, hidden=32, layers=2, heads=2, intermediate=64,
            projection_dim=16,
        ),
        img_size=32,
        dtype=np.float32,
        mesh=mesh,
    )


def test_xl_score_triplet_paths_matches_fresh_encode(tmp_path):
    from diffsim_tpu.core.image import load_and_process_u8

    scorer = _xl_scorer()
    paths = _image_files(tmp_path, 4)
    pa = [paths[0]] * 2
    pb = [paths[1], paths[2]]
    pc = [paths[3], paths[1]]
    kw = dict(prompt="p", target_step=900)
    s_ab, s_ac = scorer.score_triplet_paths(pa, pb, pc, **kw)
    assert scorer._moment_cache.misses == 4  # unique images only
    pix = [np.concatenate([load_and_process_u8(p, 32) for p in role]) for role in (pa, pb, pc)]
    f_ab, f_ac = scorer.score_triplet_batch(*pix, **kw)
    np.testing.assert_allclose(s_ab, f_ab, atol=2e-6)
    np.testing.assert_allclose(s_ac, f_ac, atol=2e-6)
    # all-hit rescore is bit-identical
    s2 = scorer.score_triplet_paths(pa, pb, pc, **kw)
    np.testing.assert_array_equal(s_ab, s2[0])


def test_dit_score_triplet_paths_matches_fresh_encode(tmp_path):
    from diffsim_tpu.core.image import load_and_process_u8
    from diffsim_tpu.metrics.diffsim_dit import DiffSimDiT
    from diffsim_tpu.models import dit as dit_mod

    scorer = DiffSimDiT(
        dit_cfg=dit_mod.DiTConfig.tiny(input_size=16, num_classes=1000),
        vae_cfg=vae.VAEConfig.tiny(),
        img_size=32,
        dtype=np.float32,
    )
    paths = _image_files(tmp_path, 4)
    pa = [paths[0]] * 2
    pb = [paths[1], paths[2]]
    pc = [paths[3], paths[2]]
    kw = dict(target_layer=0, target_step=600)
    s_ab, s_ac = scorer.score_triplet_paths(pa, pb, pc, **kw)
    assert scorer._moment_cache.misses == 4
    pix = [np.concatenate([load_and_process_u8(p, 32) for p in role]) for role in (pa, pb, pc)]
    f_ab, f_ac = scorer.score_triplet_batch(*pix, **kw)
    np.testing.assert_allclose(s_ab, f_ab, atol=2e-6)
    np.testing.assert_allclose(s_ac, f_ac, atol=2e-6)


def test_xl_cached_scan_chunks_match_monolithic(tmp_path):
    """XL cached path with chunk= dispatches ONE scan program (one launch + one fetch per
    window, not one per chunk); scores must match the monolithic graph up to fusion-order
    rounding."""
    scorer = _xl_scorer()
    paths = _image_files(tmp_path, 6)
    pa, pb, pc = paths[0:2] * 2, paths[2:4] * 2, paths[4:6] * 2
    kw = dict(prompt="p", target_step=900)
    mono = scorer.score_triplet_paths(pa, pb, pc, **kw)
    chunked = scorer.score_triplet_paths(pa, pb, pc, chunk=2, **kw)
    np.testing.assert_allclose(mono[0], chunked[0], atol=2e-6)
    np.testing.assert_allclose(mono[1], chunked[1], atol=2e-6)


def _dit_scorer(mesh=None):
    from diffsim_tpu.metrics.diffsim_dit import DiffSimDiT
    from diffsim_tpu.models import dit as dit_mod

    return DiffSimDiT(
        dit_cfg=dit_mod.DiTConfig.tiny(input_size=16, num_classes=1000),
        vae_cfg=vae.VAEConfig.tiny(),
        img_size=32,
        dtype=np.float32,
        mesh=mesh,
    )


def test_dit_cached_scan_chunks_match_monolithic(tmp_path):
    scorer = _dit_scorer()
    paths = _image_files(tmp_path, 6)
    pa, pb, pc = paths[0:2] * 2, paths[2:4] * 2, paths[4:6] * 2
    kw = dict(target_layer=0, target_step=600)
    mono = scorer.score_triplet_paths(pa, pb, pc, **kw)
    chunked = scorer.score_triplet_paths(pa, pb, pc, chunk=2, **kw)
    np.testing.assert_allclose(mono[0], chunked[0], atol=2e-6)
    np.testing.assert_allclose(mono[1], chunked[1], atol=2e-6)


def test_dit_cached_scan_on_mesh_matches_single_device(tmp_path):
    """The DiT scan graph's mesh branch (PartitionSpec(None, 'data') over scan windows)
    must score identically to the single-device dispatch."""
    paths = _image_files(tmp_path, 6)
    pa, pb, pc = paths[0:2] * 4, paths[2:4] * 4, paths[4:6] * 4
    kw = dict(target_layer=0, target_step=600)
    ref = _dit_scorer().score_triplet_paths(pa, pb, pc, chunk=4, **kw)
    got = _dit_scorer(mesh=meshlib.make_mesh(4)).score_triplet_paths(pa, pb, pc, chunk=4, **kw)
    np.testing.assert_allclose(got[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], atol=1e-5)


def test_xl_cached_path_on_mesh_matches_single_device(tmp_path):
    paths = _image_files(tmp_path, 6)
    pa, pb, pc = paths[0:2], paths[2:4], paths[4:6]
    kw = dict(prompt="p", target_step=900)
    ref = _xl_scorer().score_triplet_paths(pa, pb, pc, **kw)
    got = _xl_scorer(mesh=meshlib.make_mesh(8)).score_triplet_paths(pa, pb, pc, **kw)
    np.testing.assert_allclose(got[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], atol=1e-5)


def test_prewarm_missing_submits_only_nonresident_unique():
    """Runner prewarm: the NEXT chunk's not-yet-cached unique paths get threaded decodes
    (futures dropped — the ImageLoader LRU retains the arrays); resident and duplicate
    paths are skipped."""
    from diffsim_tpu.runtime.device_cache import image_key, prewarm_missing

    cache, _ = _np_cache(8)
    # residency is keyed by image_key (fspath, mtime_ns, size) — seed with the same keys
    # prewarm_missing computes (nonexistent paths degrade to (fspath, 0, 0))
    cache.ensure([image_key("a"), image_key("b")], lambda ks: _rows_for([k[0] for k in ks]))

    class Loader:
        def __init__(self):
            self.submitted = []

        def submit(self, path):
            self.submitted.append(path)

    ld = Loader()
    n = prewarm_missing(cache, (["a", "c"], ["c", "d"], ["b", "d"]), ld)
    assert n == 2 and sorted(ld.submitted) == ["c", "d"]


def test_failed_fill_leaves_cache_consistent():
    """Review finding (round 4): a decode or device-update failure mid-fill must never
    leave keys mapped to unwritten rows — later calls would silently 'hit' garbage."""
    calls = {"n": 0}

    def update(pool, rows, slots):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("relay compile 500")
        out = pool.copy()
        out[slots] = rows
        return out

    cache = DeviceFeatureCache(np.zeros((128, 2), np.float32), update, 128)
    keys = [f"k{i}" for i in range(66)]  # slabs: 64 + 2 -> second slab raises
    with pytest.raises(RuntimeError):
        cache.ensure(keys, _rows_for)
    # first slab's keys are valid residents; the failed slab's are not
    assert [k in cache for k in keys] == [True] * 64 + [False] * 2
    np.testing.assert_array_equal(cache.pool[cache._slot_of["k0"]], _rows_for(["k0"])[0])
    # decode failure before any assignment: nothing changes
    cache2 = DeviceFeatureCache(np.zeros((4, 2), np.float32), lambda p, r, s: p, 4)

    def bad_rows(missing):
        raise OSError("unreadable image")

    with pytest.raises(OSError):
        cache2.ensure(["x"], bad_rows)
    assert "x" not in cache2 and cache2.stats["resident"] == 0
    # the failed keys re-miss and fill cleanly afterwards
    slots = cache.ensure(keys, _rows_for)
    for k, s in zip(keys, slots):
        np.testing.assert_array_equal(cache.pool[s], _rows_for([k])[0])


def test_bench_reuse_workload_contract():
    """bench.py's ReuseWorkload (the driver's round-end artifact depends on it): row_map
    carries exactly the NEW keys of each batch, every path is resolvable, and the long-run
    unique:reference ratio approaches 1/REUSE."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import ReuseWorkload

    rng = np.random.default_rng(0)
    work = ReuseWorkload(rng, img=8, ring=4, reuse=10)
    seen = set()
    refs = 0
    for _ in range(30):
        paths, row_map = work.batch(16)
        flat = [p for role in paths for p in role]
        refs += len(flat)
        new = set(flat) - seen
        assert new == set(row_map), (new, set(row_map))
        for k, v in row_map.items():
            assert v.shape == (8, 8, 3) and v.dtype == np.uint8
        seen |= set(flat)
    ratio = len(seen) / refs
    assert 0.05 < ratio < 0.2, ratio  # ~1/10 unique per reference


def test_xl_dit_cached_chunks_match_plain(tmp_path):
    """Host-side chunking (HBM safety at 1024px) is score-invariant for XL and DiT."""
    from diffsim_tpu.metrics.diffsim_dit import DiffSimDiT
    from diffsim_tpu.models import dit as dit_mod

    paths = _image_files(tmp_path, 8)
    pa = [paths[i % 4] for i in range(6)]
    pb = [paths[4 + i % 2] for i in range(6)]
    pc = [paths[6 + i % 2] for i in range(6)]

    xl = _xl_scorer()
    plain = xl.score_triplet_paths(pa, pb, pc, prompt="p", target_step=900)
    chunked = xl.score_triplet_paths(pa, pb, pc, prompt="p", target_step=900, chunk=2)
    np.testing.assert_array_equal(plain[0], chunked[0])
    np.testing.assert_array_equal(plain[1], chunked[1])

    dit_sc = DiffSimDiT(dit_cfg=dit_mod.DiTConfig.tiny(input_size=16, num_classes=1000),
                        vae_cfg=vae.VAEConfig.tiny(), img_size=32, dtype=np.float32)
    plain = dit_sc.score_triplet_paths(pa, pb, pc, target_layer=0, target_step=600)
    chunked = dit_sc.score_triplet_paths(pa, pb, pc, target_layer=0, target_step=600, chunk=3)
    np.testing.assert_array_equal(plain[0], chunked[0])
    np.testing.assert_array_equal(plain[1], chunked[1])


def test_cached_path_on_model_axis_mesh_matches_single_device(tmp_path):
    """The ('data','model') mesh's model axis is reserved (all backbones fit one chip);
    a non-trivial model axis must still score identically — activations replicate over it
    and the shard_mapped kernels carry it as equal-value lanes."""
    paths = _image_files(tmp_path, 6)
    pa, pb, pc = paths[0:2], paths[2:4], paths[4:6]
    kw = dict(prompt="p", target_step=600)
    ref = _scorer().score_triplet_paths(pa, pb, pc, **kw)
    got = _scorer(mesh=meshlib.make_mesh(8, model_axis=2)).score_triplet_paths(pa, pb, pc, **kw)
    np.testing.assert_allclose(got[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], atol=1e-5)


def test_resolve_cached_chunk_policy():
    """HBM-safety auto-chunking: large T at high resolution chunks by the 24@512px anchor
    scaled by resolution^2; production-sized calls (runner batches, bench) stay monolithic;
    explicit chunk must divide by the mesh data axis."""
    from diffsim_tpu.runtime.device_cache import resolve_cached_chunk

    # production shapes: no auto-chunking
    assert resolve_cached_chunk(None, 24, None, 512) == (24, 24)
    assert resolve_cached_chunk(None, 2, None, 1024) == (2, 2)
    # the measured OOM class (96 triplets @512px -> 21G/15.75G): auto-chunks at 24
    assert resolve_cached_chunk(None, 96, None, 512) == (24, 96)
    # 1024px: anchor scales to 6
    step, n = resolve_cached_chunk(None, 16, None, 1024)
    assert step == 6 and n == 18
    # explicit chunk pads T up to a multiple
    assert resolve_cached_chunk(None, 10, 4, 512) == (4, 12)
    # mesh: quantum divides everything
    mesh = meshlib.make_mesh(8)
    assert resolve_cached_chunk(mesh, 5, None, 512) == (8, 8)
    step, n = resolve_cached_chunk(mesh, 200, None, 512)
    assert step == 24 and n == 216  # auto 24 is an 8-multiple
    with pytest.raises(ValueError):
        resolve_cached_chunk(mesh, 16, 6, 512)  # 6 not a multiple of the data axis


def test_image_key_invalidates_on_overwrite(tmp_path):
    """Advisor finding (round 4): moment-cache keys must carry mtime/size like ImageLoader's
    LRU key (core/image.py) — a long-lived process (cli.serve) that overwrites an image in
    place must re-encode it, not score stale cached moments."""
    import os
    import time

    from diffsim_tpu.runtime.device_cache import ensure_image_slots, image_key

    p = tmp_path / "img.bin"
    p.write_bytes(b"v1")
    k1 = image_key(p)
    assert k1[0] == os.fspath(p) and k1[2] == 2

    cache, calls = _np_cache(8, row_shape=(1, 1, 3))
    decoded = []

    def load_fn(path):
        content = open(path, "rb").read()
        decoded.append(content)
        return np.full((1, 1, 1, 3), content[-1], np.uint8)

    roles = ([p], [p], [p])
    idx1 = ensure_image_slots(cache, roles, (None, None, None), None, load_fn)
    assert len(decoded) == 1 and cache.stats["misses"] == 1

    # same content, same stat -> hit, no decode
    ensure_image_slots(cache, roles, (None, None, None), None, load_fn)
    assert len(decoded) == 1 and cache.stats["hits"] >= 3

    # overwrite in place (force a different mtime_ns/size) -> new key -> re-decoded
    time.sleep(0.01)
    p.write_bytes(b"v2-longer")
    assert image_key(p) != k1
    ensure_image_slots(cache, roles, (None, None, None), None, load_fn)
    assert len(decoded) == 2 and decoded[-1] == b"v2-longer"
    assert cache.stats["misses"] == 2
    del idx1
