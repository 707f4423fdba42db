// Native panoptic codec: fused rgb→id decode + per-segment mask extraction
// + nearest-neighbour downsample, one pass over the image.
//
// Role: the host-side data path (SURVEY.md §2.1 pipeline ops).  The
// reference does this work in python/numpy per image (rgb2id, then one
// `pan == id` full-image compare per segment, then interpolate —
// kings_sgg/.../relation_transformer_head_v4.py:408-435 and
// tools/parse_predict.py:16-37).  With one host core feeding a TPU, those
// repeated full-image passes become the input bottleneck; this kernel does
// the id decode, the per-segment membership tests and the stride-S
// downsample in a single traversal.
//
// The encode direction (measured, tools/bench_host.py): the submission
// writer's paint (one `pan == id` pass per segment, 287 ms at 1344²×20)
// plus cv2 RGB PNG encode (90 ms) cap the host at ~3 img/s — an 8-chip
// pod needs ≥ 30.  paint_index + encode_palette_png below do the same
// work in one traversal + a palette (color type 3) PNG, ~25× faster;
// cv2.imread expands palette PNGs to BGR, so graders see identical bytes
// semantics (reference emission contract: tools/infer.py:149-188).
//
// Build: cc -O3 -shared -fPIC pan_codec.cpp -lz -o libpancodec.so
// Bound via ctypes (openpsg_tpu/native/__init__.py) with a numpy fallback.

#include <cstdint>
#include <cstring>

#include <zlib.h>

extern "C" {

// rgb [h*w*3] uint8 → ids [h*w] int32  (id = r + 256 g + 65536 b)
void rgb2id(const uint8_t* rgb, int32_t* ids, int64_t n_pixels) {
    for (int64_t i = 0; i < n_pixels; ++i) {
        const uint8_t* p = rgb + 3 * i;
        ids[i] = (int32_t)p[0] + ((int32_t)p[1] << 8) + ((int32_t)p[2] << 16);
    }
}

// ids [h*w] int32 → rgb [h*w*3] uint8
void id2rgb(const int32_t* ids, uint8_t* rgb, int64_t n_pixels) {
    for (int64_t i = 0; i < n_pixels; ++i) {
        uint8_t* p = rgb + 3 * i;
        int32_t v = ids[i];
        p[0] = (uint8_t)(v & 0xFF);
        p[1] = (uint8_t)((v >> 8) & 0xFF);
        p[2] = (uint8_t)((v >> 16) & 0xFF);
    }
}

// Fused: id map [h, w] + K segment ids → K boolean masks on the
// (out_h, out_w) grid via nearest-neighbour sampling.  masks is
// [K, out_h, out_w] uint8, zero-initialized by the caller.
void extract_masks_downsampled(
    const int32_t* ids, int64_t h, int64_t w,
    const int32_t* segment_ids, int64_t k,
    uint8_t* masks, int64_t out_h, int64_t out_w) {
    // inverse nearest map: for each output pixel, sample the input pixel
    for (int64_t oy = 0; oy < out_h; ++oy) {
        // match jax.image.resize(method='nearest'): src = floor((o+0.5)*scale)
        int64_t sy = (int64_t)(((double)oy + 0.5) * (double)h / (double)out_h);
        if (sy >= h) sy = h - 1;
        for (int64_t ox = 0; ox < out_w; ++ox) {
            int64_t sx = (int64_t)(((double)ox + 0.5) * (double)w / (double)out_w);
            if (sx >= w) sx = w - 1;
            int32_t v = ids[sy * w + sx];
            for (int64_t s = 0; s < k; ++s) {
                if (segment_ids[s] == v) {
                    masks[(s * out_h + oy) * out_w + ox] = 1;
                    break;  // segment ids are unique per pixel
                }
            }
        }
    }
}

// Fused rgb decode + mask extraction (skips materializing the id map).
void rgb_to_masks_downsampled(
    const uint8_t* rgb, int64_t h, int64_t w,
    const int32_t* segment_ids, int64_t k,
    uint8_t* masks, int64_t out_h, int64_t out_w) {
    for (int64_t oy = 0; oy < out_h; ++oy) {
        int64_t sy = (int64_t)(((double)oy + 0.5) * (double)h / (double)out_h);
        if (sy >= h) sy = h - 1;
        for (int64_t ox = 0; ox < out_w; ++ox) {
            int64_t sx = (int64_t)(((double)ox + 0.5) * (double)w / (double)out_w);
            if (sx >= w) sx = w - 1;
            const uint8_t* p = rgb + 3 * (sy * w + sx);
            int32_t v = (int32_t)p[0] + ((int32_t)p[1] << 8) + ((int32_t)p[2] << 16);
            for (int64_t s = 0; s < k; ++s) {
                if (segment_ids[s] == v) {
                    masks[(s * out_h + oy) * out_w + ox] = 1;
                    break;
                }
            }
        }
    }
}

// ids [n] int32 + K unique segment ids → idx [n] uint8 palette indices:
// 0 = background (id not in the list), s+1 = segment s.  K ≤ 254.
// One traversal with a small open-addressing hash (K is ~20).
void paint_index(const int32_t* ids, int64_t n,
                 const int32_t* seg, int64_t k, uint8_t* idx) {
    const int HB = 1024;               // power of two ≥ 4·254
    int32_t keys[HB];
    uint8_t vals[HB];
    for (int i = 0; i < HB; ++i) keys[i] = -1;
    for (int64_t s = 0; s < k && s < 254; ++s) {
        uint32_t h = ((uint32_t)seg[s] * 2654435761u) & (HB - 1);
        while (keys[h] != -1) h = (h + 1) & (HB - 1);
        keys[h] = seg[s];
        vals[h] = (uint8_t)(s + 1);
    }
    int32_t last_id = -1;              // segments are contiguous blobs:
    uint8_t last_idx = 0;              // memoize the previous pixel's hit
    for (int64_t i = 0; i < n; ++i) {
        int32_t v = ids[i];
        if (v == last_id) { idx[i] = last_idx; continue; }
        uint32_t h = ((uint32_t)v * 2654435761u) & (HB - 1);
        uint8_t out = 0;
        while (keys[h] != -1) {
            if (keys[h] == v) { out = vals[h]; break; }
            h = (h + 1) & (HB - 1);
        }
        last_id = v;
        last_idx = out;
        idx[i] = out;
    }
}

static void be32(uint8_t* p, uint32_t v) {
    p[0] = (uint8_t)(v >> 24); p[1] = (uint8_t)(v >> 16);
    p[2] = (uint8_t)(v >> 8);  p[3] = (uint8_t)v;
}

// One PNG chunk: length + type + payload + CRC.  Returns bytes written.
static int64_t chunk(uint8_t* out, const char* type,
                     const uint8_t* payload, uint32_t len) {
    be32(out, len);
    memcpy(out + 4, type, 4);
    if (len) memcpy(out + 8, payload, len);
    uint32_t c = crc32(0L, Z_NULL, 0);
    c = crc32(c, out + 4, len + 4);
    be32(out + 8 + len, c);
    return (int64_t)len + 12;
}

// idx [h*w] uint8 + palette [n_colors*3] RGB → complete 8-bit palette
// (color type 3) PNG.  `out` must hold compressBound(h*(w+1)) + 1100 +
// 3*n_colors bytes; returns the PNG length, or -1 on error.
int64_t encode_palette_png(const uint8_t* idx, int64_t h, int64_t w,
                           const uint8_t* palette, int64_t n_colors,
                           uint8_t* out, int64_t out_cap) {
    if (h <= 0 || w <= 0 || n_colors <= 0 || n_colors > 256) return -1;
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    int64_t pos = 0;
    if (out_cap < 64) return -1;
    memcpy(out, sig, 8); pos += 8;

    uint8_t ihdr[13];
    be32(ihdr, (uint32_t)w);
    be32(ihdr + 4, (uint32_t)h);
    ihdr[8] = 8;    // bit depth
    ihdr[9] = 3;    // color type: palette
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    pos += chunk(out + pos, "IHDR", ihdr, 13);
    pos += chunk(out + pos, "PLTE", palette, (uint32_t)(3 * n_colors));

    // IDAT: zlib stream of the filtered scanlines (filter byte 0 + row).
    // Stream row-by-row — no (w+1)·h temp buffer.
    int64_t idat_start = pos + 8;      // payload begins after len+type
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (deflateInit(&zs, 1) != Z_OK) return -1;   // level 1: speed
    zs.next_out = out + idat_start;
    int64_t avail = out_cap - idat_start - 24;    // reserve CRC + IEND
    if (avail < 64) { deflateEnd(&zs); return -1; }
    zs.avail_out = (uInt)(avail < 0x7FFFFFFF ? avail : 0x7FFFFFFF);
    const uint8_t zero = 0;
    for (int64_t y = 0; y < h; ++y) {
        zs.next_in = (Bytef*)&zero;
        zs.avail_in = 1;
        if (deflate(&zs, Z_NO_FLUSH) != Z_OK || zs.avail_out == 0) {
            deflateEnd(&zs); return -1;
        }
        zs.next_in = (Bytef*)(idx + y * w);
        zs.avail_in = (uInt)w;
        if (deflate(&zs, Z_NO_FLUSH) != Z_OK || zs.avail_out == 0) {
            deflateEnd(&zs); return -1;
        }
    }
    if (deflate(&zs, Z_FINISH) != Z_STREAM_END) { deflateEnd(&zs); return -1; }
    uint32_t idat_len = (uint32_t)zs.total_out;
    deflateEnd(&zs);

    // stitch the IDAT framing around the already-written payload
    be32(out + pos, idat_len);
    memcpy(out + pos + 4, "IDAT", 4);
    uint32_t c = crc32(0L, Z_NULL, 0);
    c = crc32(c, out + pos + 4, idat_len + 4);
    be32(out + idat_start + idat_len, c);
    pos = idat_start + idat_len + 4;

    pos += chunk(out + pos, "IEND", NULL, 0);
    return pos;
}

}  // extern "C"
