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
