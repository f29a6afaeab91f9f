"""Hand-derived golden frames: reference-format vectors computed ON PAPER.

Every other golden in this repo was produced by running this repo's own
code, so a systematic error shared by spec + native + kernels would be
invisible. The three frames below were derived by hand-executing the
reference algorithm (normalization: reference src/histogram.rs:93-155;
header: src/histogram.rs:342-431; table build: src/fse.rs:101-189;
encode: src/fse.rs:210-250; frame: src/lib.rs:112-183) with pencil-level
arithmetic — every intermediate value is written out in the comments so
a reviewer can re-verify any step without trusting any code here.

GOLDEN 1 — k=1, L=5, src = [0,1,0,2,0,3,0,1]  (8 bytes)
=======================================================
Histogram: counts = {0:4, 1:2, 2:1, 3:1}, size 8, table_len 4.
optimal_log2(8): min(11, ilog2(7)-2)=0 raised to min(ilog2(8)+1=4,
ilog2(3)+2=3)=3, clamped to [5,15] -> 5.

Normalize to 2^5 = 32 (fast path; low threshold = 8>>5 = 0, no -1s):
scale = 62-5 = 57, step = 2^62/8 = 2^59.
  sym0: 4*2^59 >> 57 = 16   (>=8, no RTB correction)
  sym1: 2*2^59 >> 57 =  8   (not <8, no RTB)
  sym2: 1*2^59 >> 57 =  4   (<8; rest = 2^59 - 4<<57 = 0, not > RTB -> 4)
  sym3:                  4   (same)
sum = 32 exactly -> nothing to distribute. norm = [16, 8, 4, 4], L=5.

Header (threshold=32, remaining=33, nbits=6; value = count+1):
  sym0: v=17, max=2*32-1-33=30, 17<30  -> small: 17 in 5 bits.
        remaining 17 -> threshold 16/nbits 5.
  sym1: v=9,  max=2*16-1-17=14, 9<14   -> small: 9 in 4 bits.
        remaining 9 -> threshold 8/nbits 4.
  sym2: v=5,  max=2*8-1-9=6,  5<6      -> small: 5 in 3 bits.
        remaining 5 -> threshold 4/nbits 3.
  sym3: v=5,  max=2*4-1-5=2,  5>=2, 5>=threshold4 -> large: 5+2=7 in 3 bits.
        remaining 1 -> done.
Bits LSB-first: 0000 | 10001 | 1001 | 101 | 111  (19 bits -> 3 bytes)
  byte0 = bits 0..7  = 0,0,0,0,1,0,0,0 -> 0x10
  byte1 = bits 8..15 = 1,1,0,0,1,1,0,1 -> 0xB3
  byte2 = bits 16..18 = 1,1,1          -> 0x07
HEADER = 10 B3 07.

Encode table (L=5, size 32, spread step = 32*5//8+3 = 23, no low-prob):
positions j*23 mod 32 for j=0..31:
  0,23,14,5,28,19,10,1,24,15,6,29,20,11,2,25,16,7,30,21,12,3,26,17,
  8,31,22,13,4,27,18,9         (ends back at 0: full cycle)
sym0 takes the first 16, sym1 the next 8, sym2 next 4, sym3 last 4.
Next-state (stable sort of slots by symbol, entry = 32 + slot):
  sym0 idx 0..15: 32,33,34,37,38,42,43,46,47,51,52,55,56,57,60,61
  sym1 idx16..23: 35,39,44,48,49,53,58,62
  sym2 idx24..27: 40,45,54,63
  sym3 idx28..31: 36,41,50,59
Transforms (bits=(maxBits<<16)-(count<<maxBits), find=total-count):
  sym0: maxBits=5-ilog2(15)=2, bits=131072-64=131008,  find=-16
  sym1: maxBits=5-ilog2(7) =3, bits=196608-64=196544,  find=8
  sym2: maxBits=5-ilog2(3) =4, bits=262144-64=262080,  find=20
  sym3:                        bits=262080,            find=24

Encode (k=1): init with src[7]=1: bits_out=(196544>>16)+1=3,
value=(3<<16)-196544=64, idx=(64>>3)+8=16 -> value=table[16]=35.
Then i=6..0 (bits_out=((tt.bits+value)&u32)>>16; emit value's low bits):
  i=6 sym0: v=35, bo=1, emit 1      -> idx (35>>1)-16=1,  v=33
  i=5 sym3: v=33, bo=3, emit 1      -> idx (33>>3)+24=28, v=36
  i=4 sym0: v=36, bo=1, emit 0      -> idx 18-16=2,       v=34
  i=3 sym2: v=34, bo=3, emit 2      -> idx (34>>3)+20=24, v=40
  i=2 sym0: v=40, bo=1, emit 0      -> idx 20-16=4,       v=38
  i=1 sym1: v=38, bo=2, emit 2      -> idx (38>>2)+8=17,  v=39
  i=0 sym0: v=39, bo=1, emit 1      -> idx 19-16=3,       v=37
finish: 37 in 5 bits (emit 5); marker bit 1.
Payload bits in write order (LSB-first):
  1 | 001 | 0 | 010 | 0 | 01 | 1 | 10100 | 1   = 18 bits -> 3 bytes
  byte0 = 1,1,0,0,0,0,1,0 -> 0x43
  byte1 = 0,0,1,1,1,0,1,0 -> 0x5C
  byte2 = 0,1             -> 0x02
FRAME = 10 B3 07 43 5C 02, payload_bits = 18.

GOLDEN 2 — k=2, same src, same table/header
===========================================
Stream j takes symbols i with i%2==j. Init (top two symbols):
  enc0 <- src[6]=0: bits_out=(131008>>16)+1=2, value=(2<<16)-131008=64,
          idx=(64>>2)-16=0 -> v0=table[0]=32
  enc1 <- src[7]=1: v1=35 (as in golden 1)
Interleave i=5..0 (descending):
  i=5 enc1 sym3: v=35, bo=3, emit 3 -> idx 4+24=28, v1=36
  i=4 enc0 sym0: v=32, bo=1, emit 0 -> idx 16-16=0, v0=32
  i=3 enc1 sym2: v=36, bo=3, emit 4 -> idx 4+20=24, v1=40
  i=2 enc0 sym0: v=32, bo=1, emit 0 -> v0=32
  i=1 enc1 sym1: v=40, bo=2, emit 0 -> idx 10+8=18, v1=44
  i=0 enc0 sym0: v=32, bo=1, emit 0 -> v0=32
finish enc1 (44 -> emit 12 in 5 bits) then enc0 (32 -> emit 0); marker.
Bits: 110 | 0 | 001 | 0 | 00 | 0 | 00110 | 00000 | 1 = 22 bits:
  byte0 = 1,1,0,0,0,0,1,0 -> 0x43
  byte1 = 0,0,0,0,0,1,1,0 -> 0x60
  byte2 = 0,0,0,0,0,1     -> 0x20
FRAME = 10 B3 07 43 60 20, payload_bits = 22.

GOLDEN 3 — k=1, L=5, low-probability (-1) sentinel path, 32 bytes
=================================================================
src (22 x sym0, 7 x sym1, 2 x sym2, 1 x sym3):
  [0,0,1,0,0,2,0,1,0,0,0,1,0,3,0,0,1,0,0,1,0,0,2,0,1,0,0,0,1,0,0,0]
Normalize to 2^5: low threshold = 32>>5 = 1, so sym3 (count 1) -> -1.
  sym0: 22*2^57 >> 57 = 22;  sym1: 7 (<8, rest=0, no RTB bump);  sym2: 2.
  22+7+2 = 31 (+1 low-prob slot) = 32 exactly. norm = [22, 7, 2, -1].
Header (threshold=32, remaining=33, nbits=6):
  sym0: v=23, max=30, small     -> 23 in 5 bits; remaining 11,
        threshold 16->8, nbits 4.
  sym1: v=8, max=2*8-1-11=4, 8>=4, 8>=threshold8 -> large: 8+4=12 in 4b;
        remaining 4, threshold 4, nbits 3.
  sym2: v=3, max=2*4-1-4=3, 3>=3, 3<threshold4  -> large: 3 in 3 bits;
        remaining 2, threshold 2, nbits 2.
  sym3: v=(-1)+1=0, max=2*2-1-2=1, 0<1          -> small: 0 in 1 bit;
        remaining 1 -> done.
Bits: 0000 | 11101 | 0011 | 110 | 0 = 17 bits ->
  byte0 = 0,0,0,0,1,1,1,0 -> 0x70; byte1 = 1,0,0,1,1,1,1,0 -> 0x79;
  byte2 = 0x00.   HEADER = 70 79 00.
Table: high_threshold = 30; sym3 pre-placed at slot 31. Spread sequence
(j*23 mod 32, skipping 31 which j=25 hits): sym0 at
0,23,14,5,28,19,10,1,24,15,6,29,20,11,2,25,16,7,30,21,12,3; sym1 at
26,17,8,22,13,4,27; sym2 at 18,9.
Next-state: sym0 idx0..21 = 32,33,34,35,37,38,39,42,43,44,46,47,48,51,
52,53,55,56,57,60,61,62; sym1 idx22..28 = 36,40,45,49,54,58,59;
sym2 idx29..30 = 41,50; sym3 idx31 = 63.
Transforms: sym0 maxBits=5-ilog2(21)=1, bits=65536-44=65492, find=-22;
sym1 maxBits=3, bits=196608-56=196552, find=15; sym2 maxBits=5,
bits=327680-64=327616, find=27; sym3 (-1 path) bits=(5<<16)-(1<<5)
=327648, find=total-1=30.
Encode: init src[31]=0: bits_out=(65492>>16)+1=1, value=65536-65492=44,
idx=(44>>1)-22=0 -> v=32. Steps (i, sym, v_in, bits_out, emit, v_out):
  (30,0,32,0,-,46)(29,0,46,1,0,33)(28,1,33,2,1,40)(27,0,40,0,-,57)
  (26,0,57,1,1,39)(25,0,39,0,-,56)(24,1,56,3,0,36)(23,0,36,0,-,52)
  (22,2,52,4,4,50)(21,0,50,1,0,35)(20,0,35,0,-,51)(19,1,51,2,3,58)
  (18,0,58,1,0,42)(17,0,42,0,-,61)(16,1,61,3,5,36)(15,0,36,0,-,52)
  (14,0,52,1,0,37)(13,3,37,5,5,63)   <- the -1 symbol: always L bits
  (12,0,63,1,1,44)(11,1,44,2,0,54)(10,0,54,1,0,38)(9,0,38,0,-,55)
  (8,0,55,1,1,38)(7,1,38,2,2,45)(6,0,45,1,1,32)(5,2,32,4,0,41)
  (4,0,41,0,-,60)(3,0,60,1,0,43)(2,1,43,2,3,49)(1,0,49,1,1,34)
  (0,0,34,0,-,48)
finish: 48 in 5 bits (emit 16); marker. Payload = 40 coded bits + 5
state bits + 1 marker = 46 bits -> 6 bytes: 0A B2 2A D1 E0 30.
FRAME = 70 79 00 0A B2 2A D1 E0 30, payload_bits = 46.
"""

import numpy as np
import pytest

from entropy_coders_tpu import native
from entropy_coders_tpu.spec.codec import fse_compress, fse_decompress
from entropy_coders_tpu.spec.histogram import Histogram, NormHistogram

GOLDEN1_SRC = bytes([0, 1, 0, 2, 0, 3, 0, 1])
GOLDEN1_FRAME = bytes.fromhex("10b307435c02")
GOLDEN1_BITS = 18

GOLDEN2_FRAME = bytes.fromhex("10b307436020")
GOLDEN2_BITS = 22

GOLDEN3_SRC = bytes([0, 0, 1, 0, 0, 2, 0, 1, 0, 0, 0, 1, 0, 3, 0, 0,
                     1, 0, 0, 1, 0, 0, 2, 0, 1, 0, 0, 0, 1, 0, 0, 0])
GOLDEN3_FRAME = bytes.fromhex("7079000ab22ad1e030")
GOLDEN3_BITS = 46


@pytest.mark.parametrize("src,frame,bits,k", [
    (GOLDEN1_SRC, GOLDEN1_FRAME, GOLDEN1_BITS, 1),
    (GOLDEN1_SRC, GOLDEN2_FRAME, GOLDEN2_BITS, 2),
    (GOLDEN3_SRC, GOLDEN3_FRAME, GOLDEN3_BITS, 1),
], ids=["k1", "k2", "lowprob"])
def test_spec_compress_matches_paper(src, frame, bits, k):
    dst = bytearray()
    _, nbits = fse_compress(src, dst, k=k)
    assert bytes(dst) == frame
    assert nbits == bits


@pytest.mark.parametrize("src,frame,k", [
    (GOLDEN1_SRC, GOLDEN1_FRAME, 1),
    (GOLDEN1_SRC, GOLDEN2_FRAME, 2),
    (GOLDEN3_SRC, GOLDEN3_FRAME, 1),
], ids=["k1", "k2", "lowprob"])
def test_spec_decompress_matches_paper(src, frame, k):
    out = bytearray()
    n = fse_decompress(frame, out, k=k)
    assert n == len(src) and bytes(out) == src


def test_normalization_matches_paper():
    h1 = Histogram(np.frombuffer(GOLDEN1_SRC, np.uint8))
    assert h1.optimal_log2() == 5
    n1 = h1.normalize(5)
    assert n1.table[:4].tolist() == [16, 8, 4, 4] and n1.log2 == 5
    h3 = Histogram(np.frombuffer(GOLDEN3_SRC, np.uint8))
    n3 = h3.normalize(5)
    assert n3.table[:4].tolist() == [22, 7, 2, -1] and n3.table_len == 4


def test_headers_match_paper():
    for frame, counts in ((GOLDEN1_FRAME, [16, 8, 4, 4]),
                          (GOLDEN3_FRAME, [22, 7, 2, -1])):
        hist, _ = NormHistogram.read(frame)
        assert hist.table[:4].tolist() == counts
        out = bytearray()
        hist.write(out)
        assert bytes(out) == frame[:3]


def test_native_matches_paper():
    if not native.available():
        pytest.skip("native codec unavailable")
    for src, frame, k in ((GOLDEN1_SRC, GOLDEN1_FRAME, 1),
                          (GOLDEN1_SRC, GOLDEN2_FRAME, 2),
                          (GOLDEN3_SRC, GOLDEN3_FRAME, 1)):
        assert native.compress(src, k=k) == frame
        assert native.decompress(frame, k=k, max_out=len(src)) == src
