"""Public-API parity with the reference crate (SURVEY.md §2 inventory).

Each reference item (src/lib.rs, src/histogram.rs, src/fse.rs public
surface) must have a working equivalent here."""

import numpy as np
import pytest

import entropy_coders_tpu as ect
from tests.conftest import gen_sequence


def test_fse_compress2_matches_k2():
    data = gen_sequence(0.2, 1 << 12)
    a, b = bytearray(), bytearray()
    _, bits_k2 = ect.fse_compress(data, a, k=2)
    bits_2 = ect.fse_compress2(data, b)
    assert bytes(a) == bytes(b) and bits_k2 == bits_2
    out = bytearray()
    assert ect.fse_decompress2(b, out) == len(data)
    assert bytes(out) == data.tobytes()


def test_histogram_accessors():
    data = gen_sequence(0.2, 1 << 12)
    h = ect.Histogram(data)
    assert h.size == len(data)
    assert h.table_len == int(np.flatnonzero(h.table)[-1]) + 1
    assert list(h.table_iter()) == list(h.table[: h.table_len])
    # documented (fixed) semantics: distinct symbols present
    assert h.symbol_count() == int(np.count_nonzero(h.table))
    n = h.normalize_optimal()
    assert n.symbol_count() == h.symbol_count()
    assert sum(1 if c == -1 else c for c in n.table_iter()) == 1 << n.log2_sum()


def test_table_update():
    d1 = gen_sequence(0.2, 1 << 12)
    d2 = gen_sequence(0.7, 1 << 12, seed=3)
    h1, h2 = (ect.NormHistogram.new(d) for d in (d1, d2))
    et = ect.EncodeTable(h1)
    dt = ect.DecodeTable(h1)
    et.update(h2)
    dt.update(h2)
    et2, dt2 = ect.EncodeTable(h2), ect.DecodeTable(h2)
    assert (et.table == et2.table).all() and (et.tt_bits == et2.tt_bits).all()
    assert (dt.packed == dt2.packed).all()


def test_error_subtypes():
    # table log above maximum: header nibble 15 -> log2 20
    with pytest.raises(ect.TableLogTooLarge):
        ect.NormHistogram.read(bytes([0xFF, 0xFF, 0xFF, 0xFF]))
    with pytest.raises(ect.HistError):
        ect.NormHistogram.read(b"")
    assert issubclass(ect.TableLogTooLarge, ect.HistError)
    assert issubclass(ect.TooManySymbols, ect.HistError)
    assert issubclass(ect.HeaderIo, ect.HistError)


def test_raw_variants_equal():
    from entropy_coders_tpu.spec.bitstream import BitStackReader, BitStackWriter

    data = gen_sequence(0.3, 512)
    hist = ect.NormHistogram.new(data)
    et = ect.EncodeTable(hist)
    out = bytearray()
    w = BitStackWriter(out)
    e = ect.Encoder.new_first_symbol(et, int(data[-1]))
    for i, b in enumerate(data[-2::-1]):
        (e.encode_raw if i % 2 else e.encode)(w, int(b))
    e.finish(w)
    w.write_bits(1, 1)
    w.finish()
    r = BitStackReader.new(bytes(out))
    dt = ect.DecodeTable(hist)
    d = ect.Decoder(dt, r)
    got = []
    while True:
        s = (d.decode_symbol_no_reload if len(got) % 2 else d.decode_symbol)(r)
        if s is None:
            break
        got.append(s)
    got.append(d.finish())
    assert bytes(got) == data.tobytes()


def test_compress_bound_and_write_bound():
    data = gen_sequence(0.2, 1 << 12)
    hist = ect.NormHistogram.new(data)
    frame = bytearray()
    _, bits = ect.fse_compress(data, frame, k=2)
    assert len(frame) <= ect.EncodeTable.compress_bound(len(data))
    hdr = bytearray()
    n = hist.write(hdr)
    assert len(hdr) <= hist.write_bound()
