"""synthesis_in_style_tpu — TPU-native (JAX/XLA/Pallas) framework with the
capabilities of hendraet/synthesis-in-style.

Pipeline (reference: /root/reference README.md:1-5):
  1. train a StyleGAN2/SWAGAN generator on unlabelled document scans
  2. cluster intermediate feature maps (spherical k-means), hand-label clusters
  3. synthesize an arbitrarily large *labelled* segmentation dataset
  4. train a semantic segmentation network (DocUFCN / EMANet / TransUNet / PixelEnsemble)
  5. patch-based inference + evaluation (Dice/IoU/precision/recall, COCO GT)

Design stance (not a port): NHWC layouts, pure-functional flax models, a single
XLA dilated-conv for upfirdn2d (double-differentiable for free), jitted train
steps sharded over a `jax.sharding.Mesh`, and a trigger/extension trainer
substrate replacing the external `pytorch_training` dependency.
"""

__version__ = "0.1.0"
