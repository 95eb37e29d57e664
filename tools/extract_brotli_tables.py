#!/usr/bin/env python3
"""Extract the RFC 7932 (brotli) normative tables into one resource
blob for the pure-JVM decoder (graft.sources.Brotli).

Every byte extracted here is PUBLIC SPEC DATA: the static dictionary
is RFC 7932 Appendix A, the word transforms are Appendix B, and the
literal context lookup table is the Section 7.1 table. The local
libbrotlicommon.so is merely a convenient carrier of those published
constants (typing 122k bytes out of the RFC by hand invites typos);
the differential test suite (tools/gen_brotli_vectors.py +
BrotliSpec) validates the extraction end to end against an
independent implementation.

Output format (big-endian lengths), written to
src/main/resources/graft/brotli_tables.bin:

  [32]   size_bits_by_length          (dictionary geometry)
  [2048] context lookup table          (4 modes x 512)
  [26x3] block-length code ranges      (u16 offset BE, u8 nbits)
  [u16]  nTransforms
  per transform: [u8 prefixLen][prefix][u8 type][u8 suffixLen][suffix]
  [u32]  dictionary data size
  [...]  dictionary data
"""
import ctypes, struct, sys, os

LIB = "/root/miniconda/lib/libbrotlicommon.so"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/graft/brotli_tables.bin")

lib = ctypes.CDLL(LIB)


class BrotliDictionary(ctypes.Structure):
    _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.POINTER(ctypes.c_uint8))]


lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
lib.BrotliGetTransforms.restype = ctypes.c_void_p
lib.BrotliTransformDictionaryWord.restype = ctypes.c_int
lib.BrotliTransformDictionaryWord.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
    ctypes.c_int]

d = lib.BrotliGetDictionary().contents
size_bits = bytes(d.size_bits_by_length)
data = ctypes.string_at(d.data, d.data_size)
print("dictionary: %d bytes, size_bits=%s" % (len(data), list(size_bits)))
assert len(data) == 122784, "unexpected dictionary size"
# offsets must be derivable from size_bits (the decoder derives them)
off = 0
for i in range(32):
    assert d.offsets_by_length[i] == off, (i, d.offsets_by_length[i], off)
    if size_bits[i]:
        off += i << size_bits[i]

ctx = bytes((ctypes.c_uint8 * 2048).in_dll(lib, "_kBrotliContextLookupTable"))
print("context LUT: 2048 bytes, head=%s" % list(ctx[:8]))

# block-length code ranges: 26 x struct { uint16 offset; uint8 nbits; }
# (padded to 4); RFC 7932 section 6 table
raw = bytes((ctypes.c_uint8 * 104).in_dll(lib, "_kBrotliPrefixCodeRanges"))
ranges = [(struct.unpack("<H", raw[i*4:i*4+2])[0], raw[i*4+2])
          for i in range(26)]
print("block-length ranges: %s ... %s" % (ranges[:4], ranges[-2:]))
assert ranges[0] == (1, 2) and ranges[-1][1] == 24, ranges

# ---- transforms, recovered by probing the reference implementation --
tr = lib.BrotliGetTransforms()
W1 = b"abcdefghijklmnopqrst"
W2 = b"zyxwvutsrqponmlkjihg"

# RFC 7932 Appendix B transform types
def ferment(word, upper_all):
    out = bytearray(word)
    i = 0
    while i < len(out):
        if out[i] < 192:
            if 97 <= out[i] <= 122:
                out[i] ^= 32
            i += 1
        elif out[i] < 224:
            if i + 1 < len(out):
                out[i + 1] ^= 32
            i += 2
        else:
            if i + 2 < len(out):
                out[i + 2] ^= 5
            i += 3
        if not upper_all:
            break
    return bytes(out)

TYPES = [("identity", lambda w: w),
         ("ferment_first", lambda w: ferment(w, False)),
         ("ferment_all", lambda w: ferment(w, True))]
for k in range(1, 10):
    TYPES.append(("omit_first_%d" % k, lambda w, k=k: w[k:]))
    TYPES.append(("omit_last_%d" % k, lambda w, k=k: w[:-k]))
TYPE_ID = {n: i for i, (n, _) in enumerate(TYPES)}

def probe(idx, word):
    dst = ctypes.create_string_buffer(256)
    n = lib.BrotliTransformDictionaryWord(dst, word, len(word), tr, idx)
    return dst.raw[:n]

transforms = []
idx = 0
while idx < 256:
    try:
        o1 = probe(idx, W1)
    except Exception:
        break
    if idx >= 121:  # RFC count; anything past is shared-dict extension
        break
    o2 = probe(idx, W2)
    found = None
    for name, fn in TYPES:
        c1, c2 = fn(W1), fn(W2)
        p = o1.find(c1)
        if p < 0:
            continue
        prefix, suffix = o1[:p], o1[p + len(c1):]
        if o2 == prefix + c2 + suffix:
            found = (prefix, name, suffix)
            break
    assert found, (idx, o1, o2)
    transforms.append(found)
    idx += 1

assert len(transforms) == 121, len(transforms)
assert transforms[0] == (b"", "identity", b""), transforms[0]
assert (b"", "identity", b" ") in transforms  # the " "-suffixed twin
print("transforms: %d recovered; [0]=%s [8]=%s" %
      (len(transforms), transforms[0], transforms[8]))

blob = bytearray()
blob += size_bits
blob += ctx
for off, nb in ranges:
    blob += struct.pack(">HB", off, nb)
blob += struct.pack(">H", len(transforms))
for prefix, name, suffix in transforms:
    blob += struct.pack(">B", len(prefix)) + prefix
    blob += struct.pack(">B", TYPE_ID[name])
    blob += struct.pack(">B", len(suffix)) + suffix
blob += struct.pack(">I", len(data))
blob += data
os.makedirs(os.path.dirname(OUT), exist_ok=True)
with open(OUT, "wb") as f:
    f.write(blob)
print("wrote %s (%d bytes)" % (OUT, len(blob)))
