"""floodseg_tpu — TPU-native flood UAV video segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lenke182/flood-uav-video-segmentation (PyTorch-Lightning reference):

- Segmentation backbones: PSPNet (deep-base ResNet + pyramid pooling),
  DeepLabV3 (ResNet + ASPP), Segmenter ViT (patch embed + MaskTransformer).
- Training methods: supervised (OHEM CE), s4GAN semi-supervised,
  U2PL contrastive semi-supervised.
- Frame-interpolation ("flow") inference: encode key frames only, warp
  feature maps along H.264 block-motion-vector grids for intermediate
  frames, fused into a single XLA-compiled per-clip step.

Layout:
  core/     config, PRNG discipline, train state, checkpointing, profiling
  ops/      pure-function op library (resize/grid_sample/pool/losses/metrics)
  models/   flax.linen models in NHWC returning {"pred","aux","rep"} dicts
  video/    motion-vector grid algebra + the per-clip interpolation step
  data/     list parsing, host augmentation pipeline, prefetching loader
  parallel/ mesh construction, sharding rules, collective helpers
  train/    train/eval/predict step builders per method
  cli/      fit/test/predict entry points
"""

__version__ = "0.1.0"
