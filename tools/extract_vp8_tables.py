#!/usr/bin/env python3
"""Recover the RFC 6386 normative VP8 constant tables (default token
probabilities, token-probability update probabilities, keyframe
intra-bmode probabilities, quantizer lookup tables, category extra-bit
probabilities) from the system libwebp shared library, by searching
for well-known table prefixes from the public spec, then emit them as
Scala constant arrays.

These tables are normative constants published in RFC 6386 (sections
13.4, 13.5, 11.5, 14.1); the library is only used as a convenient
carrier of the public values. Run: python3 tools/extract_vp8_tables.py
"""
import sys

SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
data = open(SO, "rb").read()


def find_all(needle: bytes):
    out, i = [], 0
    while True:
        j = data.find(needle, i)
        if j < 0:
            return out
        out.append(j)
        i = j + 1


def u8s(off, n):
    return list(data[off:off + n])


def u16s(off, n):
    return [data[off + 2 * i] | (data[off + 2 * i + 1] << 8)
            for i in range(n)]


def expect_one(name, hits):
    if len(hits) != 1:
        print(f"!! {name}: {len(hits)} hits at {hits}", file=sys.stderr)
        if not hits:
            sys.exit(1)
    return hits[0]


# --- default coefficient probs [4][8][3][11] (RFC 6386 §13.5) -------
# first row of the published table:
# the published table's type-0 band-0 block is all 128s (that band is
# never coded for Y-after-Y2 blocks); the searchable prefix is band 1.
coef_prefix = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
coef_hits = [h - 33 for h in find_all(coef_prefix)
             if data[h - 33:h] == bytes([128] * 33)]
assert coef_hits, "no CoeffsProba0 candidate"
blobs = {data[h:h + 1056] for h in coef_hits}
assert len(blobs) == 1, "CoeffsProba0 copies disagree"
coef_off = coef_hits[0]
coeffs = u8s(coef_off, 4 * 8 * 3 * 11)
assert all(1 <= v <= 255 for v in coeffs), "probs must be 1..255"

# --- coeff prob UPDATE probs [4][8][3][11] (RFC 6386 §13.4) ---------
# first 33 bytes are 255 (three full ctx rows), then 176, 246 ...
upd_prefix = bytes([255] * 33 + [176, 246])
upd_hits = find_all(upd_prefix)
assert upd_hits and len({data[h:h + 1056] for h in upd_hits}) == 1, \
    "CoeffsUpdateProba copies missing/disagree"
upd_off = upd_hits[0]
updates = u8s(upd_off, 4 * 8 * 3 * 11)
assert all(1 <= v <= 255 for v in updates)
assert sum(1 for v in updates if v == 255) > 700, "update table is mostly 255"

# --- keyframe bmode probs [10][10][9] (RFC 6386 §11.5) --------------
bmode_prefix = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
bmode_hits = find_all(bmode_prefix)
assert bmode_hits and len({data[h:h + 900] for h in bmode_hits}) == 1, \
    "kBModesProba copies missing/disagree"
bmode_off = bmode_hits[0]
bmodes_lib = u8s(bmode_off, 10 * 10 * 9)
assert all(1 <= v <= 255 for v in bmodes_lib)
# the carrier library's bmode enum orders the diagonal modes
# RD,VR,LD,VL at 4..7 while RFC 6386's intra_bmode orders them
# LD,RD,VR,VL — re-index [above][left] into RFC numbering (the 9
# per-node probs are tree-ordered, identical in both).
perm = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # RFC mode -> library row index
bmodes = [0] * 900
for a in range(10):
    for l in range(10):
        src = (perm[a] * 10 + perm[l]) * 9
        dst = (a * 10 + l) * 9
        bmodes[dst:dst + 9] = bmodes_lib[src:src + 9]

# --- quantizer lookups (RFC 6386 §14.1): dc fits u8, ac is u16 ------
dc_prefix = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15])
dc_hits = find_all(dc_prefix)
assert dc_hits and len({data[h:h + 128] for h in dc_hits}) == 1
dc_off = dc_hits[0]
dc_tab = u8s(dc_off, 128)
ac_prefix = b""
for v in [4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19]:
    ac_prefix += bytes([v, 0])
ac_hits = find_all(ac_prefix)
assert ac_hits and len({data[h:h + 256] for h in ac_hits}) == 1
ac_off = ac_hits[0]
ac_tab = u16s(ac_off, 128)
assert dc_tab[-1] == 157 and all(dc_tab[i] <= dc_tab[i + 1] for i in range(127))
assert ac_tab[-1] == 284 and all(ac_tab[i] <= ac_tab[i + 1] for i in range(127))

# --- category extra-bit probs: confirm cat6 matches the spec --------
cat6 = bytes([254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129])
assert find_all(cat6), "cat6 probs not found — table memory is wrong"
assert find_all(bytes([180, 157, 141, 134, 130])), "cat5 not found"
assert find_all(bytes([176, 155, 140, 135])), "cat4 not found"
# keyframe ymode {145,156,163,128} / uvmode {142,114,183} probs are
# code immediates in the library, not rodata — validated instead by
# the end-to-end differential decode in tools/webp_vp8_diff.py.


def scala_u8(name, vals, per=12):
    lines = [f"  val {name}: Array[Byte] = Array[Int]("]
    for i in range(0, len(vals), per):
        chunk = ", ".join(str(v) for v in vals[i:i + per])
        lines.append(f"    {chunk},")
    lines[-1] = lines[-1].rstrip(",")
    lines.append("  ).map(_.toByte)")
    return "\n".join(lines)


def scala_int(name, vals, per=12):
    lines = [f"  val {name}: Array[Int] = Array("]
    for i in range(0, len(vals), per):
        chunk = ", ".join(str(v) for v in vals[i:i + per])
        lines.append(f"    {chunk},")
    lines[-1] = lines[-1].rstrip(",")
    lines.append("  )")
    return "\n".join(lines)


print(f"// offsets: coeffs@{coef_off} updates@{upd_off} "
      f"bmodes@{bmode_off} dc@{dc_off} ac@{ac_off}")
print(scala_u8("CoeffProbs", coeffs))
print(scala_u8("CoeffUpdateProbs", updates))
print(scala_u8("KfBModeProbs", bmodes))
print(scala_int("DcQLookup", dc_tab))
print(scala_int("AcQLookup", ac_tab))
