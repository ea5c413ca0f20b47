"""winnowmap-tpu: a TPU-native long-read genome mapper.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
marbl/Winnowmap v2.03: weighted-minimizer sketching, minimizer indexing,
seed chaining, banded affine-gap base alignment, SV-aware two-stage (MCAS)
mapping, SAM/PAF output, and a meryl-equivalent k-mer counter.
"""
__version__ = "0.1.0"
