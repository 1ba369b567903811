"""diffsim-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
showlab/DiffSim (ICCV 2025) — training-free diffusion-based perceptual similarity.

Unlike the torch reference (which monkey-patches diffusers attention processors and reads
``module.stores`` out of forward hooks, /root/reference/diffsim/diffsim.py:43-77), every model
here is a pure function that *returns* its attention taps as part of the output pytree, and the
whole scoring path (VAE encode -> q_sample -> single denoising forward -> cross-image attention
readout) is one jitted graph batched over image pairs and sharded over a TPU mesh.
"""

__version__ = "0.1.0"
