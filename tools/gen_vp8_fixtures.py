#!/usr/bin/env python3
"""Generate VP8 (lossy WebP) differential fixtures: encode test
images with the system reference codec (libwebp) — including
filtered cases (strengths 30-100, sharpness 0-7, simple-filter and
segment variants; the graft decoder applies the full in-loop
deblocking filter, so every stream must decode bit-exactly) —
decode them back with the same reference codec, and record the
decoded YUV planes' sums and CRC32. The spec (WebpVp8Spec) replays every .webp through
graft.sources.Vp8 and must reproduce the planes exactly.

Writes src/test/resources/vp8/<name>.webp + manifest.json.
"""
import ctypes, json, os, zlib, sys

sys.path.insert(0, os.path.dirname(__file__))

lw = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")


class WebPConfig(ctypes.Structure):
    _fields_ = [("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int)]


class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("max_size", ctypes.c_size_t), ("pad", ctypes.c_uint32)]


class WebPPicture(ctypes.Structure):
    _fields_ = [("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2)]


ABI = 0x0200


def encode(rgb, w, h, quality, filter_strength=0, segments=1, sns=50,
           method=4, partitions=0, filter_sharpness=0, filter_type=1):
    cfg = WebPConfig()
    assert lw.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                     ctypes.c_float(quality), ABI)
    cfg.filter_strength = filter_strength
    cfg.filter_sharpness = filter_sharpness
    cfg.filter_type = filter_type
    cfg.autofilter = 0
    cfg.segments = segments
    cfg.sns_strength = sns
    cfg.method = method
    cfg.partitions = partitions
    pic = WebPPicture()
    assert lw.WebPPictureInitInternal(ctypes.byref(pic), ABI)
    pic.width, pic.height = w, h
    assert lw.WebPPictureImportRGB(ctypes.byref(pic), bytes(rgb), w * 3)
    wr = WebPMemoryWriter()
    lw.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(lw.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    assert lw.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic)), pic.error_code
    out = ctypes.string_at(wr.mem, wr.size)
    lw.WebPPictureFree(ctypes.byref(pic))
    lw.WebPFree(ctypes.c_void_p(wr.mem))
    return out


def decode_yuv(buf):
    lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    W = ctypes.c_int(); H = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    ys = ctypes.c_int(); uvs = ctypes.c_int()
    y = lw.WebPDecodeYUV(buf, len(buf), ctypes.byref(W), ctypes.byref(H),
                         ctypes.byref(u), ctypes.byref(v),
                         ctypes.byref(ys), ctypes.byref(uvs))
    assert y, "reference decode failed"
    w, h = W.value, H.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    yb = bytes(y[r * ys.value:r * ys.value + w] for r in range(0))  # placeholder
    yb = b"".join(bytes(y[r * ys.value + c] for c in range(w)) for r in range(h))
    ub = b"".join(bytes(u[r * uvs.value + c] for c in range(cw)) for r in range(ch))
    vb = b"".join(bytes(v[r * uvs.value + c] for c in range(cw)) for r in range(ch))
    lw.WebPFree(ctypes.cast(y, ctypes.c_void_p))
    return w, h, yb, ub, vb


def img_formula(w, h, seed):
    return bytes(((seed * 7 + x * 13 + y * 29 + c * 57) % 256)
                 for y in range(h) for x in range(w) for c in range(3))


def img_flat(w, h, rgbv):
    r, g, b = rgbv
    return bytes([r, g, b] * (w * h))


def img_random(w, h, seed):
    v = seed
    out = bytearray()
    for _ in range(w * h * 3):
        v = (v * 1103515245 + 12345) & 0x7fffffff
        out.append((v >> 16) & 0xff)
    return bytes(out)


def img_gradient(w, h):
    return bytes(min(255, (x * 255) // max(1, w - 1)) if c == 0
                 else (min(255, (y * 255) // max(1, h - 1)) if c == 1 else 128)
                 for y in range(h) for x in range(w) for c in range(3))


def main():
    outdir = os.path.join(os.path.dirname(__file__), "..",
                          "src", "test", "resources", "vp8")
    os.makedirs(outdir, exist_ok=True)
    cases = [
        ("flat_16x16_q75", img_flat(16, 16, (200, 60, 90)), 16, 16,
         dict(quality=75)),
        ("formula_48x32_q75", img_formula(48, 32, 5), 48, 32,
         dict(quality=75)),
        ("formula_33x17_q50", img_formula(33, 17, 9), 33, 17,
         dict(quality=50)),
        ("random_64x48_q85", img_random(64, 48, 7), 64, 48,
         dict(quality=85)),
        ("random_64x48_q20", img_random(64, 48, 3), 64, 48,
         dict(quality=20)),
        ("gradient_80x64_q90", img_gradient(80, 64), 80, 64,
         dict(quality=90)),
        ("tiny_5x3_q75", img_formula(5, 3, 2), 5, 3, dict(quality=75)),
        ("segments4_96x80_q60", img_random(96, 80, 11), 96, 80,
         dict(quality=60, segments=4)),
        ("parts4_96x80_q60", img_random(96, 80, 13), 96, 80,
         dict(quality=60, partitions=2)),
        ("sns0_48x48_q40", img_formula(48, 48, 21), 48, 48,
         dict(quality=40, sns=0)),
        ("method0_64x32_q75", img_random(64, 32, 17), 64, 32,
         dict(quality=75, method=0)),
        ("q95_64x64", img_random(64, 64, 23), 64, 64, dict(quality=95)),
        # in-loop filter coverage: normal filter at the default
        # strength, sharpness variants, the simple filter type, and
        # filter + segments combined
        ("filt60_64x48_q75", img_random(64, 48, 31), 64, 48,
         dict(quality=75, filter_strength=60)),
        ("filt60_formula_48x32_q50", img_formula(48, 32, 37), 48, 32,
         dict(quality=50, filter_strength=60)),
        ("filt30_sharp3_64x48_q60", img_random(64, 48, 41), 64, 48,
         dict(quality=60, filter_strength=30, filter_sharpness=3)),
        ("filt80_sharp7_48x48_q30", img_random(48, 48, 43), 48, 48,
         dict(quality=30, filter_strength=80, filter_sharpness=7)),
        ("simple_filt60_64x48_q75", img_random(64, 48, 47), 64, 48,
         dict(quality=75, filter_strength=60, filter_type=0)),
        ("filt60_seg4_96x80_q60", img_random(96, 80, 53), 96, 80,
         dict(quality=60, filter_strength=60, segments=4)),
        ("filt100_gradient_80x48_q90", img_gradient(80, 48), 80, 48,
         dict(quality=90, filter_strength=100)),
        ("filt60_q10_64x48", img_random(64, 48, 59), 64, 48,
         dict(quality=10, filter_strength=60)),
    ]
    manifest = []
    for name, rgb, w, h, kw in cases:
        buf = encode(rgb, w, h, **kw)
        dw, dh, yb, ub, vb = decode_yuv(buf)
        assert (dw, dh) == (w, h)
        with open(os.path.join(outdir, name + ".webp"), "wb") as f:
            f.write(buf)
        manifest.append({
            "name": name, "width": w, "height": h, "bytes": len(buf),
            "y_sum": sum(yb), "u_sum": sum(ub), "v_sum": sum(vb),
            "crc32": zlib.crc32(yb + ub + vb) & 0xffffffff})
        # full planes for local debugging only
        with open(f"/tmp/vp8/{name}.planes", "wb") as f:
            f.write(yb + ub + vb)
    with open(os.path.join(outdir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {len(manifest)} fixtures")


if __name__ == "__main__":
    os.makedirs("/tmp/vp8", exist_ok=True)
    main()
