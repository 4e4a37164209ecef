from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ucuddle_search_engine_spark.functions.varbyte import (
    decode_doc_ids,
    delta_decode,
    delta_encode,
    encode_doc_ids,
    vb_decode,
    vb_encode,
)


def test_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_known_values():
    # 0 -> 0x80; 127 -> 0xFF; 128 -> 0x00 0x81 (little-endian 7-bit groups)
    assert vb_encode(np.array([0])) == bytes([0x80])
    assert vb_encode(np.array([127])) == bytes([0xFF])
    assert vb_encode(np.array([128])) == bytes([0x00, 0x81])
    assert list(vb_decode(bytes([0x00, 0x81]))) == [128]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_vb_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert list(vb_decode(vb_encode(arr))) == values


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
def test_docid_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    out = decode_doc_ids(encode_doc_ids(arr))
    assert list(out) == sorted(ids)


def test_delta_monotone():
    ids = np.array([3, 7, 8, 100, 1000], dtype=np.uint64)
    gaps = delta_encode(ids)
    assert list(gaps) == [3, 4, 1, 92, 900]
    assert list(delta_decode(gaps)) == list(ids)


def test_concat_decode_matches_per_block():
    """vb_decode_concat / decode_doc_ids_concat over many blocks must equal
    the per-block decoders exactly — including per-block delta RESTART for
    doc ids and empty blocks mixed in."""
    import numpy as np

    from ucuddle_search_engine_spark.functions.varbyte import (
        decode_doc_ids,
        decode_doc_ids_concat,
        encode_doc_ids,
        vb_decode,
        vb_decode_concat,
        vb_encode,
    )

    rng = np.random.RandomState(11)
    blocks, dblocks = [], []
    for i in range(200):
        n = int(rng.randint(0, 40))
        vals = rng.randint(0, 2**50, size=n).astype(np.uint64)
        blocks.append(vb_encode(vals))
        docs = np.unique(rng.randint(0, 2**40, size=n).astype(np.uint64))
        dblocks.append(encode_doc_ids(docs))

    got, counts = vb_decode_concat(blocks)
    want = [vb_decode(b) for b in blocks]
    assert list(counts) == [len(w) for w in want]
    assert np.array_equal(got, np.concatenate(want) if want else got)

    gd, dcounts = decode_doc_ids_concat(dblocks)
    wantd = [decode_doc_ids(b) for b in dblocks]
    assert list(dcounts) == [len(w) for w in wantd]
    assert np.array_equal(gd, np.concatenate(wantd))
