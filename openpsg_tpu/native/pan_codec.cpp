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
// Build: cc -O3 -shared -fPIC pan_codec.cpp -o libpancodec.so
// Bound via ctypes (openpsg_tpu/native/__init__.py) with a numpy fallback.

#include <cstdint>
#include <cstring>

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

}  // extern "C"
