"""pairnet_tpu — a TPU-native panoptic scene graph generation framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of the Pair-Net
reference (PyTorch + mmdetection; see /root/reference and SURVEY.md):

* Mask2Former-class segmenter (MSDeformAttn pixel decoder + masked-attention
  transformer decoder),
* the Pair-Net head — Pair Proposal Network (query-query affinity "Matrix
  Learner" + sparse top-k pair selection) and Relation Fusion cross-attention
  decoder,
* the baseline zoo (PSGTr, PSGFormer, two-stage IMP/MOTIFS/VCTree/GPS-Net),
* PSG / Visual Genome / OIV6 datasets, sgdet/predcls/sgcls R@K & mR@K
  evaluation, and a data-parallel sharded trainer.

Everything on the hot path runs on device with fixed shapes: Hungarian
matching, point-sampled mask costs, panoptic fusion, and triplet scoring are
all jit-compatible — no per-step host syncs (unlike the reference, which calls
scipy's linear_sum_assignment on CPU 2-3x per image per step).
"""

__version__ = "0.1.0"
