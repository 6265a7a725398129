// Native host-side image staging kernel.
//
// The TPU wire/HBM layout for images is NCHW (see ops/preprocess.py on lane
// padding), so every image loaded as HWC (PIL/numpy convention) must be
// transposed and packed into pinned batch buffers before device_put. numpy's
// strided transpose-copy is the single-core bottleneck of the staging path;
// this kernel does cache-friendly per-channel extraction with a thread pool.
//
// Built with `make -C native` (g++ -O3 -march=native, no external deps);
// loaded via ctypes with a pure-numpy fallback (utils/native.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// Transpose one HWC uint8 image into CHW at dst.
static void hwc_to_chw_one(const uint8_t* src, uint8_t* dst, int64_t h, int64_t w) {
    const int64_t plane = h * w;
    // one strided pass per channel: a single-stride gather the compiler can
    // vectorize, and each destination plane is written sequentially
    for (int64_t c = 0; c < 3; ++c) {
        const uint8_t* s = src + c;
        uint8_t* d = dst + c * plane;
        for (int64_t i = 0; i < plane; ++i) d[i] = s[3 * i];
    }
}

// Batch version: srcs[i] is an HWC uint8 image [h, w, 3]; dst is a
// contiguous [n, 3, h, w] buffer. Parallelized over images.
void hwc_to_chw_batch(const uint8_t** srcs, uint8_t* dst, int64_t n, int64_t h,
                      int64_t w, int64_t n_threads) {
    const int64_t img_bytes = 3 * h * w;
    n_threads = std::max<int64_t>(1, std::min(n_threads, n));
    if (n_threads == 1) {
        for (int64_t i = 0; i < n; ++i)
            hwc_to_chw_one(srcs[i], dst + i * img_bytes, h, w);
        return;
    }
    std::vector<std::thread> workers;
    workers.reserve(n_threads);
    for (int64_t t = 0; t < n_threads; ++t) {
        workers.emplace_back([=]() {
            for (int64_t i = t; i < n; i += n_threads)
                hwc_to_chw_one(srcs[i], dst + i * img_bytes, h, w);
        });
    }
    for (auto& th : workers) th.join();
}

}  // extern "C"
