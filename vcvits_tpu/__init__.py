"""vcvits_tpu — a TPU-native (JAX/XLA/Pallas) voice-conversion framework.

A ground-up rebuild of the capabilities of vtuber-plan/vcvits (VITS-based
any-to-any singing/speech voice conversion) designed for TPU hardware:
functional flax modules in [B, T, C] layout, a single jitted GAN train step,
pjit data/tensor parallelism over a device mesh, host-side streaming data
pipeline, Orbax checkpoints, and Pallas kernels on the hot paths.

Reference parity map lives in SURVEY.md; each module docstring cites the
reference file:line it provides the capability of (never a translation of).
"""

__version__ = "0.3.0"

from vcvits_tpu.config import Config, load_config  # noqa: F401
