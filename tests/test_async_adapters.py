"""The MetricAdapter async contract: EVERY --metric adapter's score_pairs supports
``blocking=False`` (returning a zero-arg fetch callable whose result matches the blocking
call), so the runner's async dispatch (runtime/runner.py) needs no synchronous fallback.

Round-2 review: only the diffusion scorers were truly async; CLIP/DINO/LPIPS/Gram/FFA and
score_feats_batch serialized dispatch against device compute behind a silent TypeError
fallback. Match: the ensemble's concurrent dispatch of all metrics,
/root/reference/cute_main.py:189-194."""

import numpy as np
import pytest
from PIL import Image

from diffsim_tpu.cli.args import arg_parse
from diffsim_tpu.metrics.registry import METRICS, build_metric

# 'ensemble' is a runner-level composition, not an adapter; 'dit'/'diffsim_xl'/'diffsim'
# carry the (long-tested) diffusion async path — keep one representative ('diffsim') so this
# file stays fast while still covering every adapter implementation class
ADAPTER_METRICS = sorted(set(METRICS) - {"ensemble", "dit", "diffsim_xl"})


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return [Image.fromarray(rng.integers(0, 256, (48, 56, 3)).astype(np.uint8))
            for _ in range(4)]


@pytest.mark.parametrize("metric", ADAPTER_METRICS)
def test_adapter_async_matches_blocking(metric, images):
    from diffsim_tpu.core.image import process_image

    argv = ["--metric", metric, "--model_scale", "tiny", "--image_size", "32",
            "--target_layer", "0", "--target_step", "600", "--similarity", "cosine"]
    adapter = build_metric(arg_parse(argv))
    prep = adapter.preprocess or (lambda im: process_image(im, 32))
    pa = np.concatenate([prep(images[0]), prep(images[1])], axis=0)
    pb = np.concatenate([prep(images[2]), prep(images[3])], axis=0)
    prompts = ["The photo of a thing"] * pa.shape[0]

    sync = np.asarray(adapter.score_pairs(pa, pb, prompts))
    fetch = adapter.score_pairs(pa, pb, prompts, blocking=False)
    assert callable(fetch), f"{metric}: blocking=False must return a fetch callable"
    out = np.asarray(fetch())
    assert out.shape == sync.shape == (pa.shape[0],)
    np.testing.assert_allclose(out, sync, atol=1e-5, err_msg=metric)


def test_runner_has_no_sync_fallback(tmp_path):
    """A TypeError raised INSIDE an adapter must propagate — the old runner swallowed it and
    silently retried synchronously, masking adapter bugs."""
    from diffsim_tpu.data.benchmarks import Comparison
    from diffsim_tpu.runtime import runner

    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = tmp_path / f"i{i}.png"
        Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)).save(p)
        paths.append(str(p))
    comps = [Comparison(a=paths[0], b=paths[1], c=paths[2], prompt="")]

    def bad_score_pairs(pa, pb, prompts, blocking=True):
        raise TypeError("adapter bug that must not be silently retried")

    with pytest.raises(TypeError, match="adapter bug"):
        runner.run_2afc(comps, bad_score_pairs, img_size=16, batch=1, print_fn=lambda *a: None)
