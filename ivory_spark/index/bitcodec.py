"""Bit-level Golomb/gamma postings codec — reference-format parity variant.

Reproduces the storage semantics of Ivory's positional/non-positional
postings compression (not the bytes of its Java implementation):

- bit streams with unary / gamma / Golomb / fixed-width binary codes
  (ivory/core/compression/BitOutputStream.java:159,179,292,392,
   BitInputStream.java:125,151,162,242, BitUtilities.java:33-192);
- non-positional postings layout: first docno written as 32-bit binary,
  subsequent docnos as Golomb-coded d-gaps with parameter
  b = ceil(0.69 * N / df) (N = collection doc count), tfs gamma-coded
  (ivory/core/data/index/PostingsListDocSortedNonPositional.java:42-111;
   Golomb parameter ivory/core/data/index/
   PostingsListDocSortedPositional.java:231-234).

This module exists for format parity and codec experiments only: the
engine's default codec (index/codec.py) is byte-aligned varint because
bit-granular codes are hostile to vectorization (SURVEY.md §2.4 E5), and
retrieval scores are storage-codec-independent (verified by
tests/test_bitcodec.py decoding to identical postings).

Gamma code: value v >= 1 as unary(len(bin(v))) ++ binary(v without its
leading 1). Golomb code: v >= 1 as unary(q+1) ++ truncated-binary(r)
where q = (v-1) // b, r = (v-1) % b.
"""

from __future__ import annotations

import math

import numpy as np


class BitWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._cur = 0
        self._nbits = 0

    def write_bit(self, bit: int) -> None:
        self._cur = (self._cur << 1) | (bit & 1)
        self._nbits += 1
        if self._nbits == 8:
            self._bytes.append(self._cur)
            self._cur = 0
            self._nbits = 0

    def write_binary(self, value: int, width: int) -> None:
        for i in range(width - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    def write_unary(self, value: int) -> None:
        """value >= 1: (value-1) zeros then a one (BitOutputStream:159)."""
        for _ in range(value - 1):
            self.write_bit(0)
        self.write_bit(1)

    def write_gamma(self, value: int) -> None:
        """value >= 1 (BitOutputStream:179)."""
        width = value.bit_length()
        self.write_unary(width)
        self.write_binary(value, width - 1)  # drop the leading 1

    def write_golomb(self, value: int, b: int) -> None:
        """value >= 1, parameter b >= 1 (BitOutputStream:292)."""
        q = (value - 1) // b
        r = (value - 1) % b
        self.write_unary(q + 1)
        # truncated binary for remainder in [0, b)
        ceil_log = max((b - 1).bit_length(), 1) if b > 1 else 0
        if b == 1:
            return
        cutoff = (1 << ceil_log) - b
        if r < cutoff:
            self.write_binary(r, ceil_log - 1)
        else:
            self.write_binary(r + cutoff, ceil_log)

    def getvalue(self) -> bytes:
        out = bytearray(self._bytes)
        if self._nbits:
            out.append(self._cur << (8 - self._nbits))
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0

    def read_bit(self) -> int:
        byte = self._data[self._pos >> 3]
        bit = (byte >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return bit

    def read_binary(self, width: int) -> int:
        v = 0
        for _ in range(width):
            v = (v << 1) | self.read_bit()
        return v

    def read_unary(self) -> int:
        n = 1
        while self.read_bit() == 0:
            n += 1
        return n

    def read_gamma(self) -> int:
        width = self.read_unary()
        if width == 1:
            return 1
        return (1 << (width - 1)) | self.read_binary(width - 1)

    def read_golomb(self, b: int) -> int:
        q = self.read_unary() - 1
        if b == 1:
            return q * b + 1
        ceil_log = max((b - 1).bit_length(), 1)
        cutoff = (1 << ceil_log) - b
        r = self.read_binary(ceil_log - 1)
        if r >= cutoff:
            r = ((r << 1) | self.read_bit()) - cutoff
        return q * b + r + 1


def golomb_param(n_docs: int, df: int) -> int:
    """b = ceil(0.69 * N / df), min 1 (PostingsListDocSortedPositional:231-234)."""
    return max(1, int(math.ceil(0.69 * (n_docs / df))))


def encode_postings_golomb(docnos: np.ndarray, tfs: np.ndarray, n_docs: int) -> bytes:
    """Reference layout: 32-bit first docno, Golomb d-gaps, gamma tfs
    (interleaved per posting, doc-sorted)."""
    docnos = np.asarray(docnos, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    df = len(docnos)
    w = BitWriter()
    w.write_binary(df, 32)
    if df == 0:
        return w.getvalue()
    b = golomb_param(n_docs, df)
    w.write_binary(int(docnos[0]), 32)
    w.write_gamma(int(tfs[0]))
    for i in range(1, df):
        w.write_golomb(int(docnos[i] - docnos[i - 1]), b)
        w.write_gamma(int(tfs[i]))
    return w.getvalue()


def decode_postings_golomb(blob: bytes, n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    r = BitReader(blob)
    df = r.read_binary(32)
    docnos = np.empty(df, dtype=np.int64)
    tfs = np.empty(df, dtype=np.int64)
    if df == 0:
        return docnos, tfs
    b = golomb_param(n_docs, df)
    docnos[0] = r.read_binary(32)
    tfs[0] = r.read_gamma()
    for i in range(1, df):
        docnos[i] = docnos[i - 1] + r.read_golomb(b)
        tfs[i] = r.read_gamma()
    return docnos, tfs
