// Native helpers for host-side sequential hot loops.
//
// largest_rectangle: maximal all-valid axis-aligned rectangle in a binary
// mask via the classic histogram-of-heights + monotonic stack algorithm,
// O(H*W). TPU-native replacement for the reference's Numba-compiled
// crop_mosaic (stitcher.py:340-369) — same algorithm family, C++ instead
// of LLVM-JIT, no runtime dependency.
//
// Build: g++ -O3 -shared -fPIC crop.cpp -o libpanonative.so

#include <cstdint>
#include <queue>
#include <tuple>
#include <vector>

extern "C" {

// valid: row-major H*W uint8 (nonzero = valid). out4: {top, left, bottom,
// right} inclusive bounds of the best rectangle (all zero if none).
void largest_rectangle(const uint8_t* valid, int height, int width,
                       int* out4) {
    std::vector<int> heights(width, 0);
    std::vector<int> stack(width + 1);

    long best_area = 0;
    int best_top = 0, best_left = 0, best_bottom = -1, best_right = -1;

    for (int i = 0; i < height; ++i) {
        const uint8_t* row = valid + (long)i * width;
        for (int j = 0; j < width; ++j)
            heights[j] = row[j] ? heights[j] + 1 : 0;

        // monotonic stack over the histogram (sentinel column at the end)
        int top = 0;  // stack size
        for (int j = 0; j <= width; ++j) {
            int h = (j < width) ? heights[j] : 0;
            int left = j;
            while (top > 0 && heights[stack[top - 1]] >= h) {
                int k = stack[--top];
                int hk = heights[k];
                int lk = (top > 0) ? stack[top - 1] + 1 : 0;
                long area = (long)hk * (j - lk);
                if (area > best_area) {
                    best_area = area;
                    best_top = i - hk + 1;
                    best_bottom = i;
                    best_left = lk;
                    best_right = j - 1;
                }
            }
            (void)left;
            stack[top++] = j;
        }
    }
    out4[0] = best_top;
    out4[1] = best_left;
    out4[2] = best_bottom;
    out4[3] = best_right;
}

// Graph-cut style two-source flood seam (blend.py:56-100 equivalent):
// priority-flood from left(-1)/right(+1) seeds over a cost map; result
// mask tells which side each pixel belongs to. Implemented with a binary
// heap over (cost, order) for determinism.
void seam_flood(const float* diff, int rows, int cols, int border,
                int8_t* mask) {
    // mask: 0 unknown, -1 left, +1 right (pre-seeded columns by caller or
    // here)
    using Node = std::tuple<float, long, int, int, int>;  // -cost,seq,clr,x,y
    std::priority_queue<Node, std::vector<Node>> heap;
    long seq = 0;

    for (int y = 0; y < rows; ++y) {
        for (int x = 0; x < border && x < cols; ++x) mask[(long)y*cols+x] = -1;
        for (int x = cols - border + 1; x < cols; ++x)
            if (x >= 0) mask[(long)y*cols+x] = 1;
    }
    const float kSeed = 1e3f;
    for (int y = 0; y < rows; ++y) {
        if (border < cols)
            heap.emplace(kSeed, -(seq++), -1, border, y);
        if (cols - border >= 0)
            heap.emplace(kSeed, -(seq++), 1, cols - border, y);
    }

    const int dd[4][2] = {{0, 1}, {0, -1}, {1, 0}, {-1, 0}};
    while (!heap.empty()) {
        auto [negc, s, clr, x, y] = heap.top();
        heap.pop();
        long idx = (long)y * cols + x;
        if (mask[idx] != 0) continue;
        mask[idx] = (int8_t)clr;
        for (auto& d : dd) {
            int nx = x + d[0], ny = y + d[1];
            if (nx < 0 || nx >= cols || ny < 0 || ny >= rows) continue;
            long nidx = (long)ny * cols + nx;
            // max-heap: pop the LARGEST color difference first, matching
            // the reference's heapq min-heap over -diff (blend.py:86-97)
            // and the Python fallback _seam_flood_py
            if (mask[nidx] == 0)
                heap.emplace(diff[nidx], -(seq++), clr, nx, ny);
        }
    }
}

}  // extern "C"
