"""noisyquantumsimulator_tpu — TPU-native multi-scale noisy quantum simulator.

A ground-up JAX/XLA/Pallas rebuild of the NoisyQuantumSimulator capability
stack for neutral-atom (Rydberg) quantum computers:

  Layer 0  micro-physics : batched Lindblad CZ-gate engine (gate/)
  bridge   channels      : CPTP extraction / calibration data (channels/)
  Layer 1  primitives    : Move / Gate / Measure / Cool / Idle (primitives/)
  Layer 2  architecture  : Pauli-frame QEC sampler + decoders (qec/)

Everything in the compute path is jit/vmap/grad-compatible and shards over
device meshes (parallel/).
"""
__version__ = "0.1.0"
