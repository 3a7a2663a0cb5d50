// Host-side connected-components grouping: BFS over 4-connected nonzero
// pixels of a small depth image, keeping the largest component per screen
// half (reference src/cpp_grouping/grouping.cpp:79-191 behavior).
//
// The TPU pipeline normally runs grouping on-device (ops/components.py);
// this native implementation serves hosts without an accelerator, acts as an
// independent parity oracle, and matches the reference's native-runtime
// treatment of the component.  Exposed to Python via a plain C ABI consumed
// with ctypes (no pybind11 dependency).
//
// Output contract:
//   groups   (h*w uint16): 1 = right-hand component, 2 = left-hand, 0 = none
//   g_info   (2*3 float):  rows (size, centroid_x, centroid_y), right then left
// Components with size <= pct_thresh * (h*w) are discarded; the "right" hand
// is the largest surviving component with centroid x < w/2 (the image is
// mirrored), "left" the largest with centroid x >= w/2.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

void make_groups(const uint16_t* depth, int h, int w,
                 uint16_t* groups_out, float* g_info_out, float pct_thresh) {
    const int n = h * w;
    std::vector<uint8_t> seen(n, 0);
    std::vector<int> queue;
    queue.reserve(n);

    std::vector<int> best_px[2];          // [0]=right, [1]=left
    float best_cx[2] = {0.f, 0.f};
    float best_cy[2] = {0.f, 0.f};

    std::vector<int> comp;
    comp.reserve(n);

    for (int start = 0; start < n; start++) {
        if (seen[start] || depth[start] == 0) continue;
        seen[start] = 1;
        queue.clear();
        comp.clear();
        queue.push_back(start);
        size_t head = 0;
        long long sum_x = 0, sum_y = 0;
        while (head < queue.size()) {
            const int p = queue[head++];
            comp.push_back(p);
            const int y = p / w, x = p % w;
            sum_x += x;
            sum_y += y;
            const int ny[4] = {y - 1, y + 1, y, y};
            const int nx[4] = {x, x, x - 1, x + 1};
            for (int k = 0; k < 4; k++) {
                if (ny[k] < 0 || ny[k] >= h || nx[k] < 0 || nx[k] >= w) continue;
                const int q = ny[k] * w + nx[k];
                if (seen[q]) continue;
                seen[q] = 1;
                if (depth[q]) queue.push_back(q);
            }
        }
        if (static_cast<float>(comp.size()) / n <= pct_thresh) continue;
        const float cx = static_cast<float>(sum_x) / comp.size();
        const float cy = static_cast<float>(sum_y) / comp.size();
        const int side = (cx < w / 2.0f) ? 0 : 1;
        if (comp.size() > best_px[side].size()) {
            best_px[side] = comp;
            best_cx[side] = cx;
            best_cy[side] = cy;
        }
    }

    std::memset(groups_out, 0, sizeof(uint16_t) * n);
    for (int side = 0; side < 2; side++) {
        for (int p : best_px[side]) groups_out[p] = static_cast<uint16_t>(side + 1);
        g_info_out[side * 3 + 0] = static_cast<float>(best_px[side].size());
        g_info_out[side * 3 + 1] = best_cx[side];
        g_info_out[side * 3 + 2] = best_cy[side];
    }
}

}  // extern "C"
