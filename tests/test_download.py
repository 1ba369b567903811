"""cli.download — the reference DiT/download.py semantics (find_model name/path dispatch,
EMA unwrap, pretrained_models/ layout) without network access."""

from __future__ import annotations

import os

import pytest
import torch

from diffsim_tpu.cli import download


def test_find_model_local_path_unwraps_ema(tmp_path):
    sd = {"w": torch.ones(2, 2)}
    plain = tmp_path / "plain.pt"
    torch.save(sd, plain)
    got = download.find_model(str(plain))
    assert torch.equal(got["w"], sd["w"])

    wrapped = tmp_path / "train_format.pt"
    torch.save({"ema": sd, "model": {"w": torch.zeros(2, 2)}, "opt": {}}, wrapped)
    got = download.find_model(str(wrapped))
    assert torch.equal(got["w"], sd["w"])  # the EMA branch, not "model"


def test_find_model_missing_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="could not find DiT checkpoint"):
        download.find_model(str(tmp_path / "nope.pt"))


def test_download_model_rejects_unknown_name(tmp_path):
    with pytest.raises(ValueError, match="unknown pretrained model"):
        download.download_model("DiT-G-99.pt", root=str(tmp_path))


def test_pretrained_name_downloads_once_then_caches(tmp_path, monkeypatch):
    import io

    calls = []

    class _CtxBytes(io.BytesIO):  # urlopen responses are context managers
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        calls.append(url)
        assert timeout is not None  # a blackholed network must raise, not hang
        buf = io.BytesIO()
        torch.save({"ema": {"w": torch.full((1,), 7.0)}}, buf)
        return _CtxBytes(buf.getvalue())

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    name = "DiT-XL-2-256x256.pt"
    got = download.find_model(name, root=str(tmp_path / "pretrained_models"))
    assert calls == [f"{download.WEB_ROOT}/{name}"]
    assert float(got["w"][0]) == 7.0
    assert os.path.isfile(tmp_path / "pretrained_models" / name)

    # second resolve hits the local file, no new download
    download.find_model(name, root=str(tmp_path / "pretrained_models"))
    assert len(calls) == 1


def test_offline_failure_names_url_and_drop_path(tmp_path, monkeypatch):
    import urllib.error
    import urllib.request

    def fail(url, timeout=None):
        raise urllib.error.URLError("no route to host")

    monkeypatch.setattr(urllib.request, "urlopen", fail)
    name = "DiT-XL-2-512x512.pt"
    with pytest.raises(RuntimeError) as ei:
        download.download_model(name, root=str(tmp_path))
    msg = str(ei.value)
    assert f"{download.WEB_ROOT}/{name}" in msg and str(tmp_path) in msg
