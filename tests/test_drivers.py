"""Driver protocol + CLI tests over the miniature on-disk fixtures (tiny models, CPU)."""

import os

import numpy as np
import pytest

from diffsim_tpu.data import benchmarks
from diffsim_tpu.runtime import runner
from tests import fixtures


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bench"))
    cute = fixtures.make_cute(root)
    style = fixtures.make_style(root)
    nights = fixtures.make_nights(root)
    tid = fixtures.make_tid(root)
    ipref, ipref_orig = fixtures.make_ipref(root)
    dreambench = fixtures.make_dreambench(root)
    return dict(root=root, cute=cute, style=style, nights=nights, tid=tid,
                ipref=ipref, ipref_orig=ipref_orig, dreambench=dreambench)


def test_cute_planner(data):
    comps = benchmarks.cute(data["cute"], seed=2334)
    # 2 classes x 10 experiments x 2 lvl2 dirs = 40 triplets
    assert len(comps) == 40
    c = comps[0]
    assert c.prompt == "The photo of a cat"
    # A,B from one lvl3 dir; C has the same lvl3 name under the other lvl2 dir
    assert os.path.dirname(c.a) == os.path.dirname(c.b)
    assert os.path.basename(os.path.dirname(c.c)) == os.path.basename(os.path.dirname(c.a))
    assert os.path.dirname(c.a) != os.path.dirname(c.c)
    # deterministic under the seed
    assert [
        (x.a, x.b, x.c) for x in benchmarks.cute(data["cute"], seed=2334)
    ] == [(x.a, x.b, x.c) for x in comps]
    assert [(x.a, x.b) for x in benchmarks.cute(data["cute"], seed=1)] != [(x.a, x.b) for x in comps]


def test_style_planner(data):
    comps = benchmarks.style(data["style"], seed=2333, num_triplets=50)
    assert len(comps) == 50
    for c in comps[:10]:
        assert os.path.dirname(c.a) == os.path.dirname(c.b)
        assert os.path.dirname(c.a) != os.path.dirname(c.c)
        assert c.prompt == "High quality image"


def test_nights_planner(data):
    comps = benchmarks.nights(data["nights"])
    assert len(comps) == 4  # val split only
    assert comps[0].prompt == "An image of a thing 0"
    assert comps[0].vote in (0, 1)


def test_tid_planner(data):
    comps = benchmarks.tid2013(data["tid"])
    assert len(comps) == 2 * 3
    for c in comps:
        assert c.b.endswith("_2.bmp") or c.b.endswith("_2.BMP")
        assert c.c.endswith("_3.bmp") or c.c.endswith("_3.BMP")


def test_ipref_planner(data):
    comps = benchmarks.ipref(data["ipref"], data["ipref_orig"])
    assert len(comps) == 2 * 5
    assert comps[0].a.endswith("ipA.JPG")
    assert comps[0].b.endswith("1.0.png") and comps[0].c.endswith("0.6.png")


def test_dreambench_planner(data):
    comps = benchmarks.dreambench(data["dreambench"], seed=0)
    # ratings 0..3 with gap >= 2 -> unordered pairs (0,2),(0,3),(1,3) = 3 per ref, 2 refs
    assert len(comps) == 6
    for c in comps:
        assert c.vote in (0, 1)
        assert c.a.endswith("0_0.jpg")


def test_judge_rules():
    # standard cosine: b wins when higher; 2x when > 2*
    assert runner.judge(runner.STANDARD, 0.9, 0.4, None, False) == (True, True)
    assert runner.judge(runner.STANDARD, 0.9, 0.5, None, False) == (True, False)
    # standard mse: lower better, 2x when ab*2 < ac
    assert runner.judge(runner.STANDARD, 0.1, 0.3, None, True) == (True, True)
    # TID: always greater even for mse (reference quirk, tid_main.py:165)
    assert runner.judge(runner.ALWAYS_GREATER, 0.1, 0.3, None, True) == (False, False)
    # NIGHTS: prediction vs vote
    assert runner.judge(runner.VOTE, 0.9, 0.4, 1, False) == (True, False)
    assert runner.judge(runner.VOTE, 0.9, 0.4, 0, False) == (False, False)
    # DreamBench: fixed > direction vs vote
    assert runner.judge(runner.VOTE_GREATER, 0.2, 0.4, 1, True) == (True, False)


def test_run_2afc_with_fake_scorer(data, tmp_path):
    comps = benchmarks.tid2013(data["tid"])

    def fake_scores(pa, pb, prompts, blocking=True):
        # score = mean brightness agreement -> deterministic, path-independent.
        # blocking= is part of the MetricAdapter contract (the runner always dispatches async)
        out = np.array([1.0 - abs(float(a.mean()) - float(b.mean())) for a, b in zip(pa, pb)])
        return out if blocking else (lambda: out)

    out = str(tmp_path / "res.jsonl")
    rep1 = runner.run_2afc(comps, fake_scores, rule=runner.ALWAYS_GREATER, out_path=out,
                           img_size=32, batch=4, print_fn=lambda *_: None)
    assert rep1.total == len(comps)
    # resume: second run reads the JSONL and rescoring is skipped entirely
    def exploding(*a):
        raise AssertionError("should not rescore")
    rep2 = runner.run_2afc(comps, exploding, rule=runner.ALWAYS_GREATER, out_path=out,
                           img_size=32, batch=4, print_fn=lambda *_: None)
    assert rep2.correct == rep1.correct and rep2.total == rep1.total


def test_cli_cute_tiny_end_to_end(data, tmp_path, capsys):
    from diffsim_tpu.cli.main import run_benchmark

    rep = run_benchmark(
        "cute",
        [
            "--image_path", data["cute"], "--image_size", "32", "--metric", "diffsim",
            "--target_block", "up_blocks", "--target_layer", "0", "--target_step", "600",
            "--similarity", "cosine", "--seed", "2334", "--model_scale", "tiny",
            "--batch_size", "8", "--results", str(tmp_path / "cute.jsonl"),
        ],
    )
    captured = capsys.readouterr().out
    assert rep.total == 40
    assert 0 <= rep.correct <= rep.total
    assert "Accuracy:" in captured
    assert "=========seed 2334=========" in captured


def test_cli_nights_tiny_end_to_end(data, tmp_path):
    from diffsim_tpu.cli.main import run_benchmark

    rep = run_benchmark(
        "nights",
        [
            "--image_path", data["nights"], "--image_size", "32", "--metric", "diffsim",
            "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
            "--model_scale", "tiny", "--batch_size", "4",
        ],
    )
    assert rep.total == 4


def test_cli_tid_dit_tiny(data, tmp_path):
    from diffsim_tpu.cli.main import run_benchmark

    rep = run_benchmark(
        "tid",
        [
            "--image_path", data["tid"], "--image_size", "32", "--metric", "dit",
            "--target_layer", "1", "--target_step", "750", "--similarity", "cosine",
            "--model_scale", "tiny", "--batch_size", "4",
        ],
    )
    assert rep.total == 6


def test_cli_style_xl_tiny(data, tmp_path):
    from diffsim_tpu.cli.main import run_benchmark

    rep = run_benchmark(
        "style",
        [
            "--image_path", data["style"], "--image_size", "32", "--metric", "diffsim_xl",
            "--target_layer", "0", "0", "1", "--target_step", "900", "--similarity", "cosine",
            "--model_scale", "tiny", "--batch_size", "8",
        ],
    )
    assert rep.total == 2000


def test_cli_dreambench_tiny(data, tmp_path):
    from diffsim_tpu.cli.main import run_benchmark

    rep = run_benchmark(
        "dreambench",
        [
            "--image_path", data["dreambench"], "--image_size", "32", "--metric", "diffsim",
            "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
            "--model_scale", "tiny", "--batch_size", "4",
        ],
    )
    assert rep.total == 6


def test_cli_ipref_tiny(data, tmp_path):
    from diffsim_tpu.cli.main import run_benchmark

    rep = run_benchmark(
        "ipref",
        [
            "--image_path", data["ipref"], "--original_path", data["ipref_orig"],
            "--image_size", "32", "--metric", "diffsim", "--target_layer", "5",
            "--target_step", "750", "--similarity", "cosine",
            "--model_scale", "tiny", "--batch_size", "4",
        ],
    )
    assert rep.total == 10


def test_cli_cute_ensemble_tiny(data, tmp_path):
    """2-of-3 majority vote over diffsim + clip_i + dino (/root/reference/cute_main.py:189-194).
    clip/dino run at full architecture scale on CPU (fast enough at tiny image counts)."""
    from diffsim_tpu.cli.main import run_benchmark

    rep = run_benchmark(
        "cute",
        [
            "--image_path", data["cute"], "--image_size", "32", "--metric", "ensemble",
            "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
            "--model_scale", "tiny", "--batch_size", "8",
            "--results", str(tmp_path / "ens.jsonl"),
        ],
    )
    assert rep.total == 40
    assert 0 <= rep.correct <= rep.total


def test_batch_size_invariance_spearman(data, tmp_path):
    """The same benchmark scored at different batch sizes must produce identical scores —
    validated end-to-end through the compare_results parity tool."""
    import json
    import subprocess
    import sys

    from diffsim_tpu.cli.main import run_benchmark

    outs = []
    for bs in (4, 16):
        out = str(tmp_path / f"tid_b{bs}.jsonl")
        run_benchmark(
            "tid",
            ["--image_path", data["tid"], "--image_size", "32", "--metric", "diffsim",
             "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
             "--model_scale", "tiny", "--batch_size", str(bs), "--results", out],
        )
        outs.append(out)
    from diffsim_tpu.cli import compare_results

    a = compare_results._load(outs[0])
    b = compare_results._load(outs[1])
    sa = np.array([s for i in sorted(a) for s in a[i]])
    sb = np.array([s for i in sorted(b) for s in b[i]])
    assert compare_results.spearman(sa, sb) == 1.0
    np.testing.assert_allclose(sa, sb, atol=1e-5)


def test_ensemble_decodes_each_image_once(data, tmp_path, monkeypatch):
    """The first-class ensemble path decodes every comparison image exactly once and fans the
    decoded PIL image out to all three metric preprocessors (the round-1 path re-decoded per
    metric: 3x the decode work)."""
    from collections import Counter

    from diffsim_tpu.core import image as image_mod
    from diffsim_tpu.runtime import runner as runner_mod

    del runner_mod  # imported for clarity: the counted path is the ensemble runner's decode
    counts = Counter()
    real_load = image_mod.load_image

    def counting_load(path):
        counts[path] += 1
        return real_load(path)

    monkeypatch.setattr("diffsim_tpu.core.image.load_image", counting_load)

    from diffsim_tpu.cli.main import run_benchmark

    rep = run_benchmark(
        "cute",
        [
            "--image_path", data["cute"], "--image_size", "32", "--metric", "ensemble",
            "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
            "--model_scale", "tiny", "--batch_size", "8",
        ],
    )
    assert rep.total == 40
    # every decode is exactly one PIL open per (comparison, role) occurrence — never 3x
    assert counts and max(counts.values()) <= 40 * 3  # sanity
    total_occurrences = 40 * 3
    assert sum(counts.values()) == total_occurrences, (sum(counts.values()), total_occurrences)


def test_cli_use_mask_changes_scores(data, tmp_path):
    """--use_mask with a --mask_path tree weights the tapped queries with precomputed masks
    (the reference's SAM capability, /root/reference/metrics/diffeats.py:75-87); masked scores
    must differ from unmasked ones on the same fixture."""
    import json

    from PIL import Image as _Image

    from diffsim_tpu.cli.main import run_benchmark

    # mirrored mask tree: center-square foreground for every fixture image
    mask_root = str(tmp_path / "masks")
    for dirpath, _dirs, files in os.walk(data["cute"]):
        rel = os.path.relpath(dirpath, data["cute"])
        os.makedirs(os.path.join(mask_root, rel), exist_ok=True)
        for f in files:
            m = np.zeros((32, 32), np.uint8)
            m[8:24, 8:24] = 255
            _Image.fromarray(m).save(os.path.join(mask_root, rel, f))

    base_flags = [
        "--image_path", data["cute"], "--image_size", "32", "--metric", "diffsim",
        "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
        "--model_scale", "tiny", "--batch_size", "8",
    ]
    run_benchmark("cute", base_flags + ["--results", str(tmp_path / "plain.jsonl")])
    run_benchmark(
        "cute",
        base_flags + ["--use_mask", "--mask_path", mask_root,
                      "--results", str(tmp_path / "masked.jsonl")],
    )

    def scores(p):
        return [json.loads(line)["s_ab"] for line in open(p)]

    plain, masked = scores(tmp_path / "plain.jsonl"), scores(tmp_path / "masked.jsonl")
    assert len(plain) == len(masked) == 40
    assert not np.allclose(plain, masked)


def test_cli_use_mask_generates_masks(tmp_path):
    """--use_mask WITHOUT --mask_path generates masks at score time (the reference's
    "SAM-CLIP segment the target region first" intent, /root/reference/argprocess.py:16),
    via the heuristic matting fallback; generated-mask scores differ from unmasked ones.

    Uses its own mini CUTE tree of flat-background object images (the heuristic mattes on
    border statistics, so the shared sinusoid fixtures would yield all-ones masks)."""
    import json

    from PIL import Image as _Image

    from diffsim_tpu.cli.main import run_benchmark

    root = str(tmp_path / "cute")
    rng = np.random.default_rng(7)
    s = 0
    for cls in ("cat",):
        for lvl2 in ("env_a", "env_b"):
            for lvl3 in ("obj1", "obj2"):
                d = os.path.join(root, cls, lvl2, lvl3)
                os.makedirs(d, exist_ok=True)
                for i in range(2):
                    # flat gray background + a bright off-center object square
                    arr = np.full((40, 40, 3), 120, np.uint8)
                    y, x = rng.integers(4, 16, 2)
                    arr[y : y + 18, x : x + 18] = rng.integers(200, 256, 3)
                    s += 1
                    _Image.fromarray(arr).save(os.path.join(d, f"im{i}.png"))

    base_flags = [
        "--image_path", root, "--image_size", "32", "--metric", "diffsim",
        "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
        "--model_scale", "tiny", "--batch_size", "8",
    ]
    run_benchmark("cute", base_flags + ["--results", str(tmp_path / "plain.jsonl")])
    run_benchmark(
        "cute", base_flags + ["--use_mask", "--results", str(tmp_path / "auto.jsonl")]
    )

    # the heuristic matte on these images is the object square, not all-ones
    from diffsim_tpu.core.image import mask_from_matting
    from diffsim_tpu.metrics.ffa import heuristic_matting

    some_img = os.path.join(root, "cat", "env_a", "obj1", "im0.png")
    m = mask_from_matting(heuristic_matting, some_img, 32)
    assert 0.05 < m.mean() < 0.95, m.mean()

    def scores(p):
        return [json.loads(line)["s_ab"] for line in open(p)]

    plain, auto = scores(tmp_path / "plain.jsonl"), scores(tmp_path / "auto.jsonl")
    assert len(plain) == len(auto) == 20
    assert not np.allclose(plain, auto)


def test_cli_retrieval_rank_and_grid(tmp_path):
    """cli.retrieval: rank writes reference-format "<name> <score>" files (best first,
    /root/reference/retrieval_vis.py:57-67) and grid composes a [query | top-k] PNG per
    ranking — the working replacement for the reference's import-broken retrieval_vis.py."""
    from diffsim_tpu.cli.retrieval import grid, rank

    gal = tmp_path / "gallery"
    q = tmp_path / "queries"
    gal.mkdir(); q.mkdir()
    for i in range(5):
        fixtures._img(300 + i).save(gal / f"g{i}.png")
    # query q0 is pixel-identical to gallery image g2 -> must rank first (cosine self-sim)
    fixtures._img(302).save(q / "q0.png")

    rdir = tmp_path / "rank_clip"
    rank([
        "--query_path", str(q), "--gallery_path", str(gal), "--out_path", str(rdir),
        "--metric", "clip_i", "--model_scale", "tiny", "--batch_size", "4",
        "--image_size", "32",
    ])
    lines = open(rdir / "q0.txt").read().splitlines()
    assert len(lines) == 5
    names = [ln.split()[0] for ln in lines]
    scores = [float(ln.split()[1]) for ln in lines]
    assert names[0] == "g2", lines
    assert scores == sorted(scores, reverse=True)

    out = tmp_path / "grids"
    grid([
        "--origin_path", str(gal), "--rank_dirs", str(rdir), "--query_dir", str(q),
        "--out_path", str(out), "--top_k", "4",
    ])
    assert (out / "q0.png").exists()


def test_cli_shard_partitions_benchmark(data, tmp_path):
    """--shard I/N runs a disjoint interleaved slice of the comparison plan (multi-host
    scoring: the seeded planner is deterministic on every host); per-shard JSONL results
    merge to the full run."""
    import json

    from diffsim_tpu.cli.main import run_benchmark

    base = [
        "--image_path", data["cute"], "--image_size", "32", "--metric", "diffsim",
        "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
        "--model_scale", "tiny", "--batch_size", "8",
    ]
    full = run_benchmark("cute", base + ["--results", str(tmp_path / "full.jsonl")])
    r0 = run_benchmark("cute", base + ["--shard", "0/2", "--results", str(tmp_path / "r.jsonl")])
    r1 = run_benchmark("cute", base + ["--shard", "1/2", "--results", str(tmp_path / "r.jsonl")])
    assert full.total == 40 and r0.total == 20 and r1.total == 20
    assert r0.correct + r1.correct == full.correct
    assert os.path.exists(tmp_path / "r.jsonl.s0-2") and os.path.exists(tmp_path / "r.jsonl.s1-2")
    # indices are per-shard-local; coverage check: each shard logged its 20
    def recs(p):
        return {json.loads(l)["idx"] for l in open(p)}
    assert len(recs(tmp_path / "r.jsonl.s0-2")) == 20
    assert len(recs(tmp_path / "r.jsonl.s1-2")) == 20


def test_imageloader_caches_repeated_paths(tmp_path, monkeypatch):
    """ImageLoader decodes each unique path ONCE within its LRU budget (benchmarks reuse
    images across comparisons; retrieval reuses the whole gallery per query), and evicts
    least-recently-used entries when over budget."""
    from collections import Counter

    from PIL import Image as _Image

    from diffsim_tpu.core import image as image_mod

    paths = []
    for i in range(3):
        p = str(tmp_path / f"im{i}.png")
        _Image.fromarray(np.full((8, 8, 3), 40 * i, np.uint8)).save(p)
        paths.append(p)

    counts = Counter()
    real = image_mod.load_image

    def counting(path):
        counts[path] += 1
        return real(path)

    monkeypatch.setattr(image_mod, "load_image", counting)

    loader = image_mod.ImageLoader(img_size=8)
    batch = loader.load_batch(paths * 4)  # each path requested 4x
    assert batch.shape[0] == 12
    assert all(counts[p] == 1 for p in paths), counts
    # the cached arrays are the decoded content, not stale entries
    np.testing.assert_allclose(batch[0], batch[3])

    # budget 0 disables caching
    counts.clear()
    nocache = image_mod.ImageLoader(img_size=8, cache_mb=0)
    nocache.load_batch(paths * 2)
    assert all(counts[p] == 2 for p in paths), counts

    # eviction: budget of ~1 entry keeps only the most recent path
    counts.clear()
    entry_bytes = image_mod.process_image(real(paths[0]), 8).nbytes
    small = image_mod.ImageLoader(img_size=8, cache_mb=entry_bytes * 1.5 / 1e6)
    for p in paths:
        small._load(p)
    small._load(paths[-1])  # hit
    small._load(paths[0])   # evicted -> re-decode
    assert counts[paths[-1]] == 1 and counts[paths[0]] == 2, counts


def test_cli_style_xl_ip_adapter_tiny(data, tmp_path):
    """--metric diffsim_xl --ip_adapter end-to-end through the CLI: the SDXL IP attachment
    (reference diffsim_xl.py:52-55) with random tiny weights; scores come from the attn2
    per-adapter readout (triplet fusion is disabled in IP mode)."""
    from diffsim_tpu.cli.main import run_benchmark

    rep = run_benchmark(
        "tid",
        [
            "--image_path", data["tid"], "--image_size", "32", "--metric", "diffsim_xl",
            "--target_layer", "0", "0", "1", "--target_step", "900", "--similarity", "cosine",
            "--model_scale", "tiny", "--batch_size", "4", "--ip_adapter",
        ],
    )
    assert rep.total == 6


def test_cli_weights_without_tokenizer_refused(tmp_path):
    """--weights with the HashTokenizer fallback scores garbage; the CLI must refuse unless
    --allow_hash_tokenizer (round-2 review: the silent-footgun fix)."""
    from diffsim_tpu.cli.args import arg_parse
    from diffsim_tpu.convert.store import save_params
    from diffsim_tpu.metrics.registry import build_metric

    for metric in ("diffsim", "diffsim_xl"):
        args = arg_parse(["--metric", metric, "--model_scale", "tiny", "--image_size", "32",
                          "--target_layer", "0", "--weights", str(tmp_path / "w.npz")])
        with pytest.raises(SystemExit, match="tokenizer"):
            build_metric(args)

    # with the override it proceeds (and the scorer prints the loud warning instead)
    from diffsim_tpu.metrics.diffsim_sd15 import DiffSimSD15
    from diffsim_tpu.models import clip_text, unet, vae

    sc = DiffSimSD15(unet_cfg=unet.UNetConfig.tiny(), vae_cfg=vae.VAEConfig.tiny(),
                     text_cfg=clip_text.CLIPTextConfig.tiny(), img_size=32, dtype=np.float32)
    import jax

    save_params(str(tmp_path / "w.npz"), jax.device_get(sc.params))
    args = arg_parse(["--metric", "diffsim", "--model_scale", "tiny", "--image_size", "32",
                      "--target_layer", "0", "--weights", str(tmp_path / "w.npz"),
                      "--allow_hash_tokenizer"])
    adapter = build_metric(args)
    assert adapter is not None


def test_cli_xl_vae_bf16_flag(data, tmp_path):
    """--xl_vae_bf16 wires through the registry to the XL scorer (tiny/CPU: the cast is a
    no-op at f32 compute, but the construction path and flag parsing are exercised)."""
    from diffsim_tpu.cli.args import arg_parse
    from diffsim_tpu.metrics.registry import build_metric

    args = arg_parse(["--metric", "diffsim_xl", "--model_scale", "tiny", "--image_size", "32",
                      "--target_layer", "0", "0", "1", "--target_step", "900",
                      "--similarity", "cosine", "--xl_vae_bf16"])
    adapter = build_metric(args)
    rng = np.random.default_rng(0)
    pa = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    pb = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    out = adapter.score_pairs(pa, pb, ["x", "x"])
    assert np.all(np.isfinite(out)) and out.shape == (2,)


def test_cli_retrieval_rank_diffsim_cached_matches_pairs(tmp_path):
    """The diffsim metric ranks through the device-resident moment cache (gallery pairs
    packed two-per-triplet, query forward shared); scores and order must match the plain
    score_pairs path (--no_device_cache)."""
    from diffsim_tpu.cli.retrieval import rank

    gal = tmp_path / "gallery"
    q = tmp_path / "queries"
    gal.mkdir(); q.mkdir()
    for i in range(5):  # odd gallery: exercises the pad-tail + de-interleave path
        fixtures._img(310 + i).save(gal / f"g{i}.png")
    fixtures._img(312).save(q / "q0.png")

    base = [
        "--query_path", str(q), "--gallery_path", str(gal),
        "--metric", "diffsim", "--model_scale", "tiny", "--batch_size", "2",
        "--image_size", "32", "--target_layer", "0", "--target_step", "600",
    ]
    rank(base + ["--out_path", str(tmp_path / "cached")])
    rank(base + ["--out_path", str(tmp_path / "plain"), "--no_device_cache"])

    def read(d):
        lines = open(d / "q0.txt").read().splitlines()
        return ([ln.split()[0] for ln in lines], [float(ln.split()[1]) for ln in lines])

    c_names, c_scores = read(tmp_path / "cached")
    p_names, p_scores = read(tmp_path / "plain")
    assert len(c_names) == 5 and c_names == p_names
    np.testing.assert_allclose(c_scores, p_scores, atol=2e-5)
