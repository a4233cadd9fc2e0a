"""cat_tpu — a TPU-native GAN-compression framework.

A from-scratch JAX/Flax/XLA/Pallas rebuild of the "Compression And Teaching"
(CAT) pipeline for image-to-image translation GANs:

  1. train a teacher generator (CycleGAN / pix2pix / GauGAN built from
     multi-branch "inception" inverted-residual blocks),
  2. derive a compressed student architecture by thresholding norm-layer
     scaling factors (binary search to hit a FLOPs budget),
  3. distill teacher -> student with GAN + reconstruction + kernel-alignment
     (KA) feature losses,
  4. evaluate with FID / KID / Cityscapes mIoU,
  5. export the student for deployment.

Design principles (TPU-first, not a port):
  * architecture = an explicit frozen config dataclass; a pruned student is
    just another config + a sliced parameter pytree (no module surgery),
  * NHWC layouts, static shapes, one jitted train step per model,
  * data parallelism via jax.sharding over a device mesh; cross-replica
    batch-norm is free under GSPMD jit (global-batch reductions compile to
    ICI collectives),
  * intermediate activations are returned functionally (no forward hooks),
  * FLOPs profiling is pure shape arithmetic (no device work), which makes
    the architecture search run in milliseconds on host.
"""

__version__ = "0.1.0"


def _host_keyed_cache_dir(base: str) -> str:
    """Key a cache dir by a host-CPU fingerprint (idempotent).

    XLA:CPU AOT cache entries embed the compile host's CPU features;
    entries written on another machine fail to load (cpu_aot_loader
    feature-mismatch) and every kernel silently — and slowly — recompiles.
    TPU entries AOT-load fine cross-host, so only CPU-backend runs are
    keyed; each host then populates its own CPU entries once.
    """
    import hashlib
    import os
    import platform

    if "-cpu" + os.sep in base:  # already keyed
        return base
    try:
        with open("/proc/cpuinfo") as f:
            cpu = [ln for ln in f if ln.startswith("flags")][0]
    except (OSError, IndexError):
        cpu = platform.processor() or platform.machine()
    tag = hashlib.sha256(cpu.encode()).hexdigest()[:12]
    return os.path.join(base + "-cpu", tag)


def _rekey_cache_for_cpu() -> None:
    """Re-point the live jax compilation cache at the host-keyed CPU dir.

    Call after forcing ``jax_platforms=cpu`` in a process where cat_tpu
    (and hence the shared cache dir) may already be configured.
    """
    try:
        import jax

        base = jax.config.jax_compilation_cache_dir
        if base:
            jax.config.update("jax_compilation_cache_dir",
                              _host_keyed_cache_dir(base))
    except Exception:
        pass


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (importing cat_tpu is the opt-in).

    Compiles over the remote-TPU tunnel cost seconds to minutes; the
    persistent cache makes every re-run of an unchanged step free.  Pure
    config — touches no device, so it is safe before platform selection
    (tests still force the CPU backend afterwards).  Opt out with
    CAT_TPU_NO_COMPILATION_CACHE=1; override the location with
    JAX_COMPILATION_CACHE_DIR.
    """
    import os

    if os.environ.get("CAT_TPU_NO_COMPILATION_CACHE"):
        return
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".cache", "jax"),
    )
    try:
        import jax

        if (os.environ.get("JAX_PLATFORMS") == "cpu"
                or jax.config.jax_platforms == "cpu"):
            cache_dir = _host_keyed_cache_dir(cache_dir)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never let cache config break an import
        pass


_enable_compilation_cache()
