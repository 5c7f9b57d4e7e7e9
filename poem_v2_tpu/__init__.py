"""POEM-v2-TPU: a TPU-native multi-view hand mesh reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
POEM-v2 reference (multi-view hand mesh recovery with a basis-point-set
point-embedded transformer), built SPMD-first for TPU device meshes.
"""

__version__ = "0.1.0"
