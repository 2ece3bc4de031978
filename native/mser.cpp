// Native MSER component-tree detector (C++), exposed via C ABI for ctypes.
//
// TPU-native framework counterpart of the reference's CMP MSER
// (reference: detectors/mser/** — pixel sort, union-find component tree
// over intensity thresholds, margin-based stability selection,
// second-moment ellipse output; extrema.cpp:92-193).  The component tree
// is inherently sequential/irregular, so it runs on host as native code;
// ellipses feed the TPU pipeline like any other detector's output.
//
// Algorithm: flood-fill MSER (Nister & Stewenius ECCV08 linear-time
// variant) run twice (MSER- on the image, MSER+ on the inverted image).
// Stability: relative area variation across +-delta intensity levels;
// selection by min margin, min/max size.
//
// Build: g++ -O3 -shared -fPIC -o libmser.so mser.cpp

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>

namespace {

struct Component {
    // growing history for stability analysis
    int64_t moments_x = 0, moments_y = 0;
    double moments_xx = 0, moments_xy = 0, moments_yy = 0;
    int size = 0;
    int level = 0;                 // gray level the component is at
    std::vector<std::pair<int,int>> history;  // (level, size) checkpoints
};

struct Region {
    double x, y, a11, a12, a21, a22, s;  // ellipse as affine frame
    int size;
    double stability;
};

struct Ctx {
    const uint8_t* img;
    int w, h;
    int delta;
    int min_size, max_size;
    double max_variation;
    double min_margin;
    std::vector<Region> out;
};

// flood-fill MSER pass over one polarity
void mser_pass(Ctx& c) {
    const int w = c.w, h = c.h;
    const int n = w * h;
    std::vector<uint8_t> accessible(n, 0);
    // boundary heaps: one stack of pixels per gray level
    std::vector<std::vector<int>> boundary(256);
    std::vector<Component> comp_stack;
    comp_stack.reserve(64);

    auto gray = [&](int p) -> int { return c.img[p]; };

    // start from pixel 0
    int cur_pixel = 0;
    int cur_edge = 0;
    int cur_level = gray(0);
    accessible[0] = 1;
    comp_stack.push_back(Component{});
    comp_stack.back().level = cur_level;

    auto push_history_and_check = [&](Component& co) {
        co.history.push_back({co.level, co.size});
    };

    auto emit_if_stable = [&](Component& co, int up_level) {
        // Stability at the last level `lvl` where this component is the
        // maximal region before merging at `up_level`.  The size has
        // been constant since co.level (pixels are only added at the
        // component's own level), so the span [co.level, up_level) is an
        // implicit flat stretch of history — a component that jumps a
        // wide level gap (e.g. a flat blob on a flat background) is the
        // MOST stable case (variation 0), not an unseen one.
        if (co.size < c.min_size || co.size > c.max_size) return;
        int lvl = up_level;
        int lo_size = -1;
        if (lvl - c.delta >= co.level) {
            lo_size = co.size;           // constant over the whole span
        } else {
            for (auto it = co.history.rbegin(); it != co.history.rend(); ++it) {
                if (it->first <= lvl - c.delta) { lo_size = it->second; break; }
            }
        }
        if (lo_size <= 0) return;
        double var = double(co.size - lo_size) / double(lo_size);
        if (var > c.max_variation) return;
        // margin: how long the size has been roughly stable (<=10% drop)
        double margin = lvl - co.level;
        int last = co.size;
        for (auto it = co.history.rbegin(); it != co.history.rend(); ++it) {
            if (double(last - it->second) / double(last) > 0.1) break;
            margin = lvl - it->first;
        }
        if (margin < c.min_margin) return;

        double cx = double(co.moments_x) / co.size;
        double cy = double(co.moments_y) / co.size;
        double cxx = co.moments_xx / co.size - cx * cx;
        double cxy = co.moments_xy / co.size - cx * cy;
        double cyy = co.moments_yy / co.size - cy * cy;
        // ellipse frame: A = sqrtm([[cxx,cxy],[cxy,cyy]]), normalized det 1
        double tr = cxx + cyy, det = cxx * cyy - cxy * cxy;
        if (det <= 1e-12) return;
        double sq = std::sqrt(std::max(tr * tr / 4 - det, 0.0));
        double l1 = tr / 2 + sq, l2 = tr / 2 - sq;
        if (l2 <= 1e-12) return;
        // sqrtm via eigen decomposition
        double theta = 0.5 * std::atan2(2 * cxy, cxx - cyy);
        double ct = std::cos(theta), st = std::sin(theta);
        double r1 = std::sqrt(l1), r2 = std::sqrt(l2);
        double a11 = ct * r1 * ct + st * r2 * st;   // R diag R^T
        double a12 = ct * r1 * st - st * r2 * ct;
        double a21 = a12;
        double a22 = st * r1 * st + ct * r2 * ct;
        double d2 = std::sqrt(std::abs(a11 * a22 - a12 * a21));
        // scale: geometric mean radius * 2 (as in reference ellipse size
        // convention: measurement region multiples applied downstream)
        Region r;
        r.x = cx; r.y = cy;
        r.a11 = a11 / d2; r.a12 = a12 / d2;
        r.a21 = a21 / d2; r.a22 = a22 / d2;
        r.s = 2.0 * d2;
        r.size = co.size;
        r.stability = margin;
        c.out.push_back(r);
    };

    auto merge_top_two = [&](int up_to_level) {
        // merge top of stack into the next one (or raise its level)
        while (comp_stack.size() >= 1 && comp_stack.back().level < up_to_level) {
            Component top = comp_stack.back();
            // check stability before merging away
            push_history_and_check(top);
            emit_if_stable(top, up_to_level);
            comp_stack.pop_back();
            if (comp_stack.empty() ||
                comp_stack.back().level > up_to_level) {
                // re-insert at new level
                top.level = std::min(up_to_level,
                                     comp_stack.empty() ? up_to_level
                                                        : comp_stack.back().level);
                comp_stack.push_back(top);
                return;
            }
            Component& nxt = comp_stack.back();
            nxt.moments_x += top.moments_x;
            nxt.moments_y += top.moments_y;
            nxt.moments_xx += top.moments_xx;
            nxt.moments_xy += top.moments_xy;
            nxt.moments_yy += top.moments_yy;
            nxt.size += top.size;
        }
    };

    const int dx[4] = {1, 0, -1, 0};
    const int dy[4] = {0, 1, 0, -1};

    std::vector<int> heap_count(256, 0);
    int boundary_min = 256;

    while (true) {
        int x = cur_pixel % w, y = cur_pixel / w;
        bool descended = false;
        for (; cur_edge < 4; ++cur_edge) {
            int nx = x + dx[cur_edge], ny = y + dy[cur_edge];
            if (nx < 0 || ny < 0 || nx >= w || ny >= h) continue;
            int np = ny * w + nx;
            if (accessible[np]) continue;
            int nl = gray(np);
            accessible[np] = 1;
            if (nl >= cur_level) {
                boundary[nl].push_back((np << 2));
                if (nl < boundary_min) boundary_min = nl;
            } else {
                // descend: push current pixel back on boundary, go down
                boundary[cur_level].push_back((cur_pixel << 2) | (cur_edge + 1));
                if (cur_level < boundary_min) boundary_min = cur_level;
                cur_pixel = np;
                cur_edge = 0;
                cur_level = nl;
                comp_stack.push_back(Component{});
                comp_stack.back().level = nl;
                descended = true;
                break;
            }
        }
        if (descended) continue;

        // accumulate current pixel into top component
        Component& top = comp_stack.back();
        top.moments_x += x;
        top.moments_y += y;
        top.moments_xx += double(x) * x;
        top.moments_xy += double(x) * y;
        top.moments_yy += double(y) * y;
        top.size += 1;
        top.history.push_back({cur_level, top.size});

        // pop next boundary pixel
        while (boundary_min < 256 && boundary[boundary_min].empty())
            ++boundary_min;
        if (boundary_min >= 256) {
            // done: emit remaining stack
            while (!comp_stack.empty()) {
                emit_if_stable(comp_stack.back(), 255);
                comp_stack.pop_back();
            }
            return;
        }
        int packed = boundary[boundary_min].back();
        boundary[boundary_min].pop_back();
        int np = packed >> 2;
        int ne = packed & 3;
        if (boundary_min > cur_level) {
            // process components up to the new level
            merge_top_two(boundary_min);
            if (comp_stack.empty() || comp_stack.back().level != boundary_min) {
                // ensure a component exists at this level
                if (comp_stack.empty()) {
                    comp_stack.push_back(Component{});
                    comp_stack.back().level = boundary_min;
                } else {
                    comp_stack.back().level = boundary_min;
                }
            }
        }
        cur_pixel = np;
        cur_edge = ne;
        cur_level = boundary_min;
    }
}

}  // namespace

extern "C" {

// Detect MSERs.  img: uint8 row-major [h,w].  Results written to out
// (capacity max_out rows of 8 doubles: x y a11 a12 a21 a22 s size).
// Returns number of regions (<= max_out).  polarity: 0 = dark (MSER-),
// 1 = bright (MSER+), 2 = both.
int mser_detect(const uint8_t* img, int w, int h,
                int delta, int min_size, int max_size,
                double max_variation, double min_margin,
                int polarity, double* out, int max_out) {
    std::vector<Region> all;
    std::vector<uint8_t> buf;
    for (int pol = 0; pol < 2; ++pol) {
        if (polarity != 2 && polarity != pol) continue;
        Ctx c;
        c.w = w; c.h = h;
        c.delta = delta;
        c.min_size = min_size;
        c.max_size = max_size;
        c.max_variation = max_variation;
        c.min_margin = min_margin;
        if (pol == 0) {
            c.img = img;
        } else {
            buf.resize(size_t(w) * h);
            for (size_t i = 0; i < buf.size(); ++i) buf[i] = 255 - img[i];
            c.img = buf.data();
        }
        mser_pass(c);
        all.insert(all.end(), c.out.begin(), c.out.end());
    }
    // sort by stability (margin) descending, like the reference's
    // margin-ranked output
    std::sort(all.begin(), all.end(),
              [](const Region& a, const Region& b) {
                  return a.stability > b.stability;
              });
    int n = std::min<int>(all.size(), max_out);
    for (int i = 0; i < n; ++i) {
        const Region& r = all[i];
        double* row = out + 8 * i;
        row[0] = r.x; row[1] = r.y;
        row[2] = r.a11; row[3] = r.a12;
        row[4] = r.a21; row[5] = r.a22;
        row[6] = r.s; row[7] = r.size;
    }
    return n;
}

}  // extern "C"
