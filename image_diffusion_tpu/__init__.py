"""TPU-native two-stage latent diffusion framework.

A from-scratch JAX/Flax/XLA/Pallas re-design of the capabilities of the
reference PyTorch stack (jklimmek/image-diffusion): stage-1 adversarial
autoencoders (KL-VAE / VQ-VAE + PatchGAN), stage-2 class-conditional UNet
denoiser with a 1000-step DDPM schedule and classifier-free guidance, plus
the surrounding training / data / sampling / observability tooling.

Layout (mirrors SURVEY.md section 1's layer map, TPU-first):
  core/      configs, RNG plumbing, logging, metrics, checkpoints   (L0)
  ops/       DDPM schedule math, Pallas kernels                     (L1 math)
  models/    Flax NHWC modules: layers, VAE, UNet, discriminator    (L1/L2)
  parallel/  mesh + sharding helpers                                (new)
  pipelines/ jit-compiled lax.scan sampler with batched CFG         (L3)
  training/  data pipeline + pure-function trainers                 (L4)
  compat/    PyTorch checkpoint import for parity testing
Scripts (L5) live at the repo root under scripts/.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the big jitted programs (60M-param UNet
# train step, the 1000-step sampler scan) compile once per machine instead
# of once per process.  Override the location with IDTPU_COMPILE_CACHE;
# set it empty to disable.


def _host_fingerprint() -> str:
    """Hash of the host ISA + CPU feature flags.

    The cache directory is scoped per host profile because this JAX
    version's XLA:CPU cache key does NOT include the compiling machine's
    CPU features: an AOT executable written by one host is loaded by
    another (cpu_aot_loader logs 'Machine type used for XLA:CPU
    compilation doesn't match ... could lead to execution errors such as
    SIGILL').  TPU entries are keyed by device kind and were never at
    risk, but they share the directory, so scope everything.
    """
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 spells it 'flags', arm64 'Features'
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:  # pragma: no cover - non-procfs host
        pass
    return hashlib.sha256((platform.machine() + feats).encode()).hexdigest()[:12]


_cache_dir = _os.environ.get("IDTPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/idtpu_xla"))
if _cache_dir:
    try:
        _jax.config.update(
            "jax_compilation_cache_dir", _os.path.join(_cache_dir, _host_fingerprint())
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
