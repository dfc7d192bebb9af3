"""Codec kernels — pure numpy/pyarrow, no Ray dependency.

Parity codecs (bit-identical to reference: src/writer/encoder/*): varint,
byte_rle, boolean_rle, int_rle_v1. North-rule codecs (new; ORC-spec shaped):
rle_v2, bitpack, frame_of_reference, dictionary, fsst. `selector` picks the
cheapest codec per column per partition from sampled estimates.
"""
