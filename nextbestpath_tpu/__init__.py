"""nextbestpath_tpu: TPU-native active 3D mapping / exploration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
shiyao-li/NextBestPath (see ARCHITECTURE.md).
"""

__version__ = "0.1.0"
