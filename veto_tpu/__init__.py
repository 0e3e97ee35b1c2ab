"""veto_tpu — a TPU-native scene-graph-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of visinf/veto
(ICCV 2023): a two-stage detector (ResNeXt-FPN Faster R-CNN) plus pluggable
relation heads (VETO relation transformer, Rwt beta-loss reweighting, MEET
mutually-exclusive-expert ensembles) evaluated with Recall@K / mean-Recall@K
scene-graph metrics on Visual Genome and GQA.

Design stance (TPU-first, not a port):
  * fixed-shape padded tensors + validity masks everywhere (no dynamic BoxList)
  * pure functions + pytree state, one jitted train step
  * `jax.sharding.Mesh` axes ("data", "pair") — data parallel over ICI plus a
    shardable relation-pair axis (the framework's sequence-parallel analog)
  * bf16 compute on the MXU, f32 params/optimizer state
"""

__version__ = "0.1.0"
