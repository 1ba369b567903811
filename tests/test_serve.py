"""Scoring-service tests: HTTP surface, path + base64 inputs, cross-request micro-batching."""

import base64
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from diffsim_tpu.cli.args import arg_parse
from diffsim_tpu.cli.serve import make_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    paths = []
    for i in range(4):
        p = str(root / f"im{i}.png")
        Image.fromarray(
            np.random.default_rng(i).integers(0, 256, (40, 40, 3)).astype(np.uint8)
        ).save(p)
        paths.append(p)

    args = arg_parse([
        "--metric", "diffsim", "--model_scale", "tiny", "--image_size", "32",
        "--target_layer", "0", "--target_step", "600", "--similarity", "cosine",
        "--batch_size", "8",
    ])
    srv, batcher = make_server(args, port=0, max_wait_ms=200.0)  # port 0: ephemeral
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield {"port": srv.server_address[1], "paths": paths, "batcher": batcher}
    srv.shutdown()


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/score", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_serve_scores_paths_and_b64(server):
    port, paths = server["port"], server["paths"]
    out = _post(port, {"pairs": [[paths[0], paths[1]], [paths[2], paths[3]]],
                       "prompt": "The photo of a thing"})
    assert len(out["scores"]) == 2
    assert all(np.isfinite(out["scores"]))

    # the same image delivered as base64 bytes scores identically to its path
    b64 = base64.b64encode(open(paths[1], "rb").read()).decode()
    out2 = _post(port, {"pairs": [[paths[0], {"b64": b64}]],
                        "prompt": "The photo of a thing"})
    np.testing.assert_allclose(out2["scores"][0], out["scores"][0], atol=1e-5)

    # healthz
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] is True and h["metric"] == "diffsim"


def test_serve_fuses_concurrent_requests(server):
    """Two concurrent 1-pair requests inside the batcher's wait window score in ONE device
    call (cross-request micro-batching), and each caller gets its own score back."""
    port, paths = server["port"], server["paths"]
    batcher = server["batcher"]

    calls = []
    real = batcher._score

    def counting(pix_a, pix_b, prompts):
        calls.append(len(prompts))
        return real(pix_a, pix_b, prompts)

    batcher._score = counting
    try:
        results = [None, None]

        def go(i, pair):
            results[i] = _post(port, {"pairs": [pair], "prompt": "x"})["scores"][0]

        t1 = threading.Thread(target=go, args=(0, [paths[0], paths[1]]))
        t2 = threading.Thread(target=go, args=(1, [paths[2], paths[3]]))
        t1.start(); t2.start(); t1.join(); t2.join()
    finally:
        batcher._score = real

    assert all(r is not None and np.isfinite(r) for r in results)
    # both pairs went through a single fused call (wait window 200 ms >> decode time),
    # padded to the FIXED max_batch shape so the graph never recompiles per fused size
    assert len(calls) == 1, calls
    assert calls[0] == server["batcher"]._max_batch
    # distinct pairs -> (almost surely) distinct scores, proving per-caller demux
    assert results[0] != results[1]


def test_serve_oversize_request_chunks(server):
    """A single request larger than the batcher's max_batch must be split into fixed-shape
    chunks (not scored at an arbitrary shape, which would force a full recompile per size)."""
    port, paths = server["port"], server["paths"]
    batcher = server["batcher"]
    sizes = []
    real = batcher._score

    def counting(pix_a, pix_b, prompts):
        sizes.append(len(prompts))
        return real(pix_a, pix_b, prompts)

    batcher._score = counting
    try:
        n = batcher._max_batch + 3
        pairs = [[paths[i % 2], paths[2 + i % 2]] for i in range(n)]
        out = _post(port, {"pairs": pairs, "prompt": "x"})
    finally:
        batcher._score = real
    assert len(out["scores"]) == n and all(np.isfinite(out["scores"]))
    # every device call saw exactly the fixed max_batch shape (padded)
    assert sizes and all(s == batcher._max_batch for s in sizes)
    # chunking preserves per-pair identity: a duplicate pair scores identically
    one = _post(port, {"pairs": [pairs[0]], "prompt": "x"})["scores"][0]
    np.testing.assert_allclose(out["scores"][0], one, atol=1e-5)


def test_serve_failed_chunk_cancels_queued_siblings():
    """When an early chunk of an oversize request fails, the batcher must cancel the
    still-queued sibling chunks instead of scoring them into discarded results (ADVICE r3).
    The batcher marks siblings cancelled before its next queue round, so this is race-free."""
    import time

    from diffsim_tpu.cli.serve import Batcher, _Work

    scored = []

    def score(pix_a, pix_b, prompts):
        scored.append(len(prompts))
        if len(scored) == 1:
            raise RuntimeError("boom")
        return np.zeros(len(prompts), np.float32)

    b = Batcher(score, max_batch=2, max_wait_ms=1.0)
    pix = np.zeros((6, 8, 8, 3), np.uint8)
    with pytest.raises(RuntimeError, match="boom"):
        b.submit(_Work(pix, pix, ["p"] * 6))  # 3 chunks of 2; chunk 1 fails
    # wait for the batcher to drain the cancelled chunks
    deadline = time.time() + 5
    while b.pending and time.time() < deadline:
        time.sleep(0.01)
    assert b.pending == 0
    # only the failing first chunk hit the device; chunks 2 and 3 were dropped
    assert scored == [2], scored
    # the batcher is still healthy for subsequent requests
    ok = b.submit(_Work(pix[:1], pix[:1], ["p"]))
    assert ok.scores == [0.0]
