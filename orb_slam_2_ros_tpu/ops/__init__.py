"""Hot numeric kernels: image pyramid, FAST, rBRIEF, Hamming matching.

These are the TPU-native replacements for the reference's per-pixel C++ loops
(``ORBextractor.cc``, ``ORBmatcher.cc:1649-1665``): whole-image vectorized
array ops that XLA fuses onto the VPU/MXU, with Pallas kernels for the
bandwidth-critical paths.
"""
