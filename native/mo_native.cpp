// mo_native — native data-loader kernels for mo_renderer_tpu.
//
// The reference engine's host layer is native (Rust: the `gltf` and
// `image` crates do asset decode, mo_vk does upload packing).  This
// library is the TPU build's native analog for the hot host-side paths:
//
//   * Radiance .hdr RLE scanline decode (image_io.load_hdr fallback is
//     a per-run Python loop),
//   * 2x2 quad packing of RGBA textures into uint32 rows (the gather-
//     minimal texture-stack layout built at scene pack time).
//
// Built lazily with g++ via mo_renderer_tpu/native.py (ctypes); every
// entry point has a pure-Python fallback, so the engine runs without a
// toolchain.  Plain C ABI, no dependencies.

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Parse the Radiance header. Returns 0 on success; fills width/height and
// the byte offset of the first scanline. Only the common "-Y H +X W"
// orientation is supported (matches the Python parser).
int mo_hdr_dims(const uint8_t* data, long len, int* width, int* height,
                long* payload_off) {
    if (len < 16) return -1;
    if (memcmp(data, "#?RADIANCE", 10) != 0 && memcmp(data, "#?RGBE", 6) != 0)
        return -2;
    long pos = 0;
    // header lines until the empty line
    while (pos < len) {
        long nl = pos;
        while (nl < len && data[nl] != '\n') nl++;
        if (nl >= len) return -3;
        if (nl == pos) { pos = nl + 1; break; }  // empty line
        pos = nl + 1;
    }
    // resolution line: "-Y <H> +X <W>"
    long nl = pos;
    while (nl < len && data[nl] != '\n') nl++;
    if (nl >= len) return -3;
    char line[128];
    long n = nl - pos;
    if (n <= 0 || n >= (long)sizeof(line)) return -4;
    memcpy(line, data + pos, n);
    line[n] = 0;
    int h = 0, w = 0;
    if (sscanf(line, "-Y %d +X %d", &h, &w) != 2) return -5;
    *width = w;
    *height = h;
    *payload_off = nl + 1;
    return 0;
}

// Decode scanlines into (height, width, 4) uint8 RGBE (row 0 = top).
// Handles new-style RLE and flat scanlines, matching image_io.load_hdr.
int mo_hdr_decode(const uint8_t* data, long len, long off, int width,
                  int height, uint8_t* out) {
    long p = off;
    for (int y = 0; y < height; y++) {
        uint8_t* row = out + (long)y * width * 4;
        bool rle = width >= 8 && width < 32768 && p + 4 <= len &&
                   data[p] == 2 && data[p + 1] == 2 &&
                   (((int)data[p + 2] << 8) | (int)data[p + 3]) == width;
        if (rle) {
            p += 4;
            for (int c = 0; c < 4; c++) {
                int x = 0;
                while (x < width) {
                    if (p >= len) return -10;
                    int count = data[p++];
                    if (count > 128) {  // run
                        if (p >= len) return -11;
                        uint8_t v = data[p++];
                        count -= 128;
                        if (x + count > width) return -12;
                        for (int k = 0; k < count; k++)
                            row[(x + k) * 4 + c] = v;
                        x += count;
                    } else {  // literal
                        if (p + count > len || x + count > width) return -13;
                        for (int k = 0; k < count; k++)
                            row[(x + k) * 4 + c] = data[p + k];
                        p += count;
                        x += count;
                    }
                }
            }
        } else {
            if (p + (long)width * 4 > len) return -14;
            memcpy(row, data + p, (size_t)width * 4);
            p += (long)width * 4;
        }
    }
    return 0;
}

// RGBA (s, s, 4) uint8 -> (s*s, 4) uint32 quad rows with REPEAT wrap:
// out[y*s+x] = {T(y,x), T(y,x+1), T(y+1,x), T(y+1,x+1)} where T packs
// RGBA little-endian (r | g<<8 | b<<16 | a<<24).
void mo_pack_quads(const uint8_t* rgba, int s, uint32_t* out) {
    // pack texels once
    uint32_t* packed = new uint32_t[(size_t)s * s];
    const uint8_t* src = rgba;
    for (long i = 0; i < (long)s * s; i++, src += 4) {
        packed[i] = (uint32_t)src[0] | ((uint32_t)src[1] << 8) |
                    ((uint32_t)src[2] << 16) | ((uint32_t)src[3] << 24);
    }
    for (int y = 0; y < s; y++) {
        int yp = (y + 1 == s) ? 0 : y + 1;
        const uint32_t* r0 = packed + (long)y * s;
        const uint32_t* r1 = packed + (long)yp * s;
        uint32_t* o = out + (long)y * s * 4;
        for (int x = 0; x < s; x++) {
            int xp = (x + 1 == s) ? 0 : x + 1;
            o[x * 4 + 0] = r0[x];
            o[x * 4 + 1] = r0[xp];
            o[x * 4 + 2] = r1[x];
            o[x * 4 + 3] = r1[xp];
        }
    }
    delete[] packed;
}

}  // extern "C"
