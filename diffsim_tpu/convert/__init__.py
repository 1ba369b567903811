"""Checkpoint conversion and loading.

Weights, not architectures, come from upstream (SURVEY.md §7 decision 4): torch state_dicts
(HF safetensors / .bin / DiT .pt) are converted offline into this framework's param-tree
layout and saved as a flat ``.npz`` ('/'-joined keys, NHWC/HWIO/dense-(in,out) layouts).
"""

from diffsim_tpu.convert.store import load_params, save_params  # noqa: F401
