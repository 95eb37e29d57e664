#!/usr/bin/env python3
"""Generate brotli differential test vectors for BrotliSpec: pairs of
(raw payload, reference-compressed stream) covering the format's whole
decode surface — quality 0..11 (distinct metablock/tree shapes),
window sizes, uncompressed metablocks, dictionary-heavy English,
UTF-8 multilingual, random incompressible bytes, long repetitive runs
(backward refs across the window), empty input, and a large mixed
payload. The reference encoder is the system brotli (brotlicffi);
the spec decodes each stream with graft.sources.Brotli and demands
bit-exact payload recovery. Deterministic (seeded PRNG)."""
import os, struct, random

import brotlicffi as brotli

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/graft/brotli_vectors.bin")

rng = random.Random(20260816)

english = (b"The quick brown fox jumps over the lazy dog. "
           b"Information about the world and the people of the "
           b"government, which was provided under the terms of this "
           b"agreement, should never have been published without "
           b"their time and their work across these several different "
           b"languages and countries. ")
multi = ("これは日本語のテキストです。한국어 텍스트도 있습니다. "
         "这是中文文本。Voilà du texte français, déjà vu. "
         "Русский текст тоже здесь. αβγδε ζηθικ. ").encode("utf-8")
rand1k = bytes(rng.randrange(256) for _ in range(1024))
rep = (b"abcdefgh" * 100 + b"XYZ") * 40  # long copies, distances > 256
zeros = b"\x00" * 5000
mixed = english * 50 + rand1k + multi * 20 + rep + zeros + english * 10

cases = []
def add(name, payload, quality, lgwin):
    stream = brotli.compress(payload, quality=quality, lgwin=lgwin)
    cases.append((name, payload, stream))

add("empty_q11", b"", 11, 22)
add("one_byte", b"A", 11, 22)
for q in (0, 1, 2, 4, 5, 6, 9, 10, 11):
    add("english_q%d" % q, english * 8, q, 22)
add("english_w10", english * 8, 9, 10)   # tiny window
add("english_w24", english * 200, 11, 24)  # max window
add("multi_q11", multi * 30, 11, 22)
add("multi_q5", multi * 30, 5, 22)
add("random_q5", rand1k * 8, 5, 22)      # repeated block -> long copies
add("random_q11", rand1k * 8, 11, 22)
rand8k = bytes(rng.randrange(256) for _ in range(8192))
add("incompressible_q5", rand8k, 5, 22)  # -> uncompressed metablocks
add("incompressible_q11", rand8k, 11, 22)
add("rep_q9", rep, 9, 22)
add("zeros_q1", zeros, 1, 22)
add("mixed_q9", mixed, 9, 22)
add("mixed_q11", mixed, 11, 22)
add("short_dictish_q11", b"the of and that with from", 11, 22)

# fuzz sweep: 60 seeded random compositions across the quality/window
# grid — each payload mixes text, binary runs, repeats and truncated
# UTF-8 at random proportions, so tree shapes, context maps and block
# switches vary widely
words = english.split() + [w.encode("utf-8")
                           for w in multi.decode("utf-8").split()]
for fz in range(60):
    parts = []
    for _ in range(rng.randrange(1, 8)):
        kind = rng.randrange(5)
        if kind == 0:
            parts.append(b" ".join(rng.choice(words)
                                   for _ in range(rng.randrange(1, 400))))
        elif kind == 1:
            parts.append(bytes(rng.randrange(256)
                               for _ in range(rng.randrange(1, 2000))))
        elif kind == 2:
            unit = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 40)))
            parts.append(unit * rng.randrange(2, 200))
        elif kind == 3:
            parts.append(bytes([rng.randrange(256)])
                         * rng.randrange(1, 3000))
        else:
            parts.append(multi[:rng.randrange(1, len(multi))])
    payload = b"".join(parts)
    q = rng.choice([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11])
    w = rng.choice([10, 11, 14, 18, 22, 24])
    add("fuzz%02d_q%d_w%d" % (fz, q, w), payload, q, w)

with open(OUT, "wb") as f:
    f.write(struct.pack(">I", len(cases)))
    for name, payload, stream in cases:
        nb = name.encode()
        f.write(struct.pack(">B", len(nb)) + nb)
        f.write(struct.pack(">I", len(payload)) + payload)
        f.write(struct.pack(">I", len(stream)) + stream)
total = sum(len(s) for _, _, s in cases)
print("wrote %d cases, %d compressed bytes -> %s"
      % (len(cases), total, OUT))
for name, payload, stream in cases:
    print("  %-18s payload=%7d stream=%6d" % (name, len(payload), len(stream)))
