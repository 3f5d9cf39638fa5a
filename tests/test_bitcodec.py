"""Golomb/gamma bit codec — reference-format parity round-trips
(the analogue of PostingsListDocSortedPositionalTest encode/decode
assertions) and equivalence with the default varint codec."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ivory_spark.index import bitcodec, codec


def test_gamma_roundtrip_small():
    w = bitcodec.BitWriter()
    vals = [1, 2, 3, 4, 5, 7, 8, 100, 2**20]
    for v in vals:
        w.write_gamma(v)
    r = bitcodec.BitReader(w.getvalue())
    assert [r.read_gamma() for _ in vals] == vals


def test_golomb_roundtrip_params():
    for b in [1, 2, 3, 4, 5, 7, 8, 100]:
        w = bitcodec.BitWriter()
        vals = [1, 2, 3, b, b + 1, 2 * b, 997]
        for v in vals:
            w.write_golomb(v, b)
        r = bitcodec.BitReader(w.getvalue())
        assert [r.read_golomb(b) for _ in vals] == vals, b


def test_golomb_param_formula():
    # b = ceil(0.69 * N / df)
    assert bitcodec.golomb_param(10, 3) == 3
    assert bitcodec.golomb_param(30, 3) == 7
    assert bitcodec.golomb_param(100, 100) == 1


def test_reference_fixture_postings():
    # FIXTURES.md §4 / PostingsListDocSortedPositionalTest: postings
    # [(13,5),(14,2),(24,1)] under N=10 and N=30
    for n in (10, 30):
        blob = bitcodec.encode_postings_golomb(
            np.array([13, 14, 24]), np.array([5, 2, 1]), n
        )
        d, t = bitcodec.decode_postings_golomb(blob, n)
        assert d.tolist() == [13, 14, 24]
        assert t.tolist() == [5, 2, 1]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=10**7),
)
def test_random_roundtrip_and_codec_equivalence(gaps, n_docs):
    docnos = np.cumsum(np.array(gaps, dtype=np.int64))
    tfs = (docnos % 7 + 1).astype(np.int64)
    n_docs = max(n_docs, int(docnos[-1]))
    blob = bitcodec.encode_postings_golomb(docnos, tfs, n_docs)
    d, t = bitcodec.decode_postings_golomb(blob, n_docs)
    assert np.array_equal(d, docnos)
    assert np.array_equal(t, tfs)
    # same postings through the default varint codec → identical content
    dls = np.full(len(docnos), 10, dtype=np.int64)
    vblob = codec.encode_run(
        docnos.astype(np.uint64), tfs, dls, tfs.astype(np.float32)
    )
    vd, vt, _ = codec.decode_run(vblob)
    assert np.array_equal(vd.astype(np.int64), d)
    assert np.array_equal(vt.astype(np.int64), t)
