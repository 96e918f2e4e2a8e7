"""msk144cudecoder_tpu — a TPU-native MSK144 meteor-scatter stream decoder.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CUDA
reference decoder (alexander-sholohov/msk144cudecoder): analytic-signal
conversion, wideband sync-pattern search, coherent multi-frame averaging,
batched softbit demodulation, LDPC(128,90) belief propagation, CRC-13, and
full 77-bit WSJT-X message unpacking — all redesigned for TPUs (MXU matmuls,
static shapes, masked batching, mesh sharding) rather than ported.
"""

__version__ = "0.1.0"
