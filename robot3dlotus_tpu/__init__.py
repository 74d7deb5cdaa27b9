"""robot3dlotus_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the
vlc-robot/robot-3dlotus capability set (GemBench + 3D-LOTUS / 3D-LOTUS++).

Design stance (see SURVEY.md §7):
  * ragged point clouds become padded, masked, fixed-shape dense tensors so
    every op is static-shaped for XLA and rides the MXU;
  * serialized patch attention, submanifold sparse conv, grid pool/unpool are
    implemented as vectorized XLA programs (Pallas kernels for the hot spots);
  * data parallelism is jax.sharding over a Mesh, not NCCL;
  * host-side subsystems (RLBench sim, LLM planner, VLM grounding, LMDB IO)
    speak the same obs-dict / Actioner API as the reference.
"""

__version__ = "0.1.0"
