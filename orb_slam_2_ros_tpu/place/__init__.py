"""Place recognition: vocabulary tree, BoW database, loop/reloc candidates.

TPU-native replacement for DBoW2 (``Thirdparty/DBoW2``, SURVEY.md §2.23) and
``KeyFrameDatabase`` (§2.15): the vocabulary tree is a fixed-shape array of
node descriptors descended with batched Hamming argmin; the inverted file
becomes per-keyframe sparse word/weight rows scored against a dense query
vector in one gather pass.
"""
