"""lumina_t2x_tpu: a TPU-native flow-matching generative framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
Alpha-VLLM/Lumina-T2X (text/class -> image, audio, music via flow matching),
designed TPU-first: GSPMD sharding over device meshes, scan-compiled denoise
loops, Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
