"""mods_tpu — TPU-native wide-baseline image matching (MODS rebuild).

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
ducha-aiki/mods-light-zmq: affine-covariant detection, view synthesis,
patch description (RootSIFT family + HardNet/AffNet/OriNet on device),
FGINN matching and LO-RANSAC/DEGENSAC geometric verification.
"""
__version__ = "0.1.0"
