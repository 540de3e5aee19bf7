// Native contour engine for cluster-based label synthesis.
//
// Implements the host-side hot spots of segmentation/contours.py with the
// SAME OpenCV primitives the Python path uses (raster-level behavioral
// parity with the reference pipeline,
// stylegan_code_finder/segmentation/base_cluster_based_dataset_segmenter.py:148-450):
//
//   * sis_dilate_find_contours : per-mask 3x3-cross dilation + external
//     contours (CHAIN_APPROX_SIMPLE), batched over a mask stack.
//   * sis_merge_contours       : the transitive-overlap merge fixpoint
//     (bbox prefilter -> pairwise raster overlap -> union-find -> group
//     union raster -> external contours, repeated until stable).
//   * sis_overlap_counts       : pairwise filled-overlap pixel counts
//     between two contour sets (the classification ranking kernel).
//
// The profiled Python implementation spends its time in per-pair Python
// orchestration around tiny cv2 calls; moving the loops here removes that
// overhead and — because ctypes releases the GIL — makes the existing
// thread-pool orchestration scale across host cores without the
// multiprocess pool's pickling tax (see MEASUREMENTS.md).
//
// Packed contour-set ABI (all buffers caller-allocated):
//   points  : int32[total_pts * 2]  (x, y)
//   offsets : int64[n_contours + 1] (contour i = points[offsets[i]:offsets[i+1]])
// Functions needing output space return 1 if the provided capacity was too
// small (caller doubles and retries), 0 on success, negative on error.

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>

#include <algorithm>
#include <atomic>
#include <climits>
#include <cstdint>
#include <functional>
#include <numeric>
#include <thread>
#include <vector>

namespace {

struct ContourSet {
    const int32_t* pts;
    const int64_t* offs;
    int32_t n;

    int64_t size(int32_t i) const { return (offs[i + 1] - offs[i]) / 2; }
    std::vector<cv::Point> contour(int32_t i) const {
        std::vector<cv::Point> c;
        c.reserve(size(i));
        for (int64_t p = offs[i]; p < offs[i + 1]; p += 2) {
            c.emplace_back(pts[p], pts[p + 1]);
        }
        return c;
    }
};

cv::Rect bounds_of(const std::vector<cv::Point>& c) {
    return cv::boundingRect(c);
}

// Strict-inequality bbox overlap, matching the reference
// BBox.is_overlapping_with (utils/segmentation_utils.py:52-56): boxes that
// merely touch at their extreme row/column do NOT overlap. boundingRect is
// [x, x+w) exclusive, the Python code uses inclusive maxima — so the
// reference test a.x_min < b.x_max (inclusive) becomes a.x < b.x + b.w - 1.
bool bboxes_overlap(const cv::Rect& a, const cv::Rect& b) {
    return a.x < b.x + b.width - 1 && a.x + a.width - 1 > b.x &&
           a.y < b.y + b.height - 1 && a.y + a.height - 1 > b.y;
}

int64_t overlap_count(const std::vector<cv::Point>& a, const cv::Rect& ra,
                      const std::vector<cv::Point>& b, const cv::Rect& rb) {
    if (!bboxes_overlap(ra, rb)) return 0;
    cv::Rect joint = ra | rb;
    cv::Mat ca = cv::Mat::zeros(joint.height, joint.width, CV_8U);
    cv::Mat cb = cv::Mat::zeros(joint.height, joint.width, CV_8U);
    std::vector<std::vector<cv::Point>> wrap(1);
    wrap[0] = a;
    cv::drawContours(ca, wrap, 0, cv::Scalar(1), cv::FILLED, cv::LINE_8,
                     cv::noArray(), INT_MAX, cv::Point(-joint.x, -joint.y));
    wrap[0] = b;
    cv::drawContours(cb, wrap, 0, cv::Scalar(1), cv::FILLED, cv::LINE_8,
                     cv::noArray(), INT_MAX, cv::Point(-joint.x, -joint.y));
    cv::Mat both;
    cv::bitwise_and(ca, cb, both);
    return cv::countNonZero(both);
}

struct UnionFind {
    std::vector<int> parent;
    explicit UnionFind(int n) : parent(n) {
        std::iota(parent.begin(), parent.end(), 0);
    }
    int find(int i) {
        while (parent[i] != i) {
            parent[i] = parent[parent[i]];
            i = parent[i];
        }
        return i;
    }
    void unite(int a, int b) {
        int ra = find(a), rb = find(b);
        if (ra != rb) parent[rb] = ra;
    }
};

struct Item {
    std::vector<cv::Point> contour;
    bool multi;  // absorbed more than one original contour
};

// External contours of the union raster of a group (reference
// draw_contours_on_same_sized_canvases + findContours composition).
std::vector<std::vector<cv::Point>> merge_group(
    const std::vector<const std::vector<cv::Point>*>& group) {
    cv::Rect joint = bounds_of(*group[0]);
    for (size_t i = 1; i < group.size(); ++i) joint |= bounds_of(*group[i]);
    cv::Mat canvas = cv::Mat::zeros(joint.height, joint.width, CV_8U);
    std::vector<std::vector<cv::Point>> wrap(1);
    for (const auto* c : group) {
        wrap[0] = *c;
        cv::drawContours(canvas, wrap, 0, cv::Scalar(255), cv::FILLED,
                         cv::LINE_8, cv::noArray(), INT_MAX,
                         cv::Point(-joint.x, -joint.y));
    }
    std::vector<std::vector<cv::Point>> merged;
    cv::findContours(canvas, merged, cv::RETR_EXTERNAL,
                     cv::CHAIN_APPROX_NONE);
    for (auto& c : merged) {
        for (auto& p : c) {
            p.x += joint.x;
            p.y += joint.y;
        }
    }
    return merged;
}

int write_out(const std::vector<Item>& items, bool only_keep_overlapping,
              int32_t* out_pts, int64_t out_pts_cap, int64_t* out_offs,
              int32_t out_offs_cap, int32_t* out_n) {
    int64_t pos = 0;
    int32_t n = 0;
    for (const auto& it : items) {
        if (only_keep_overlapping && !it.multi) continue;
        if (n + 1 >= out_offs_cap) return 1;
        if (pos + static_cast<int64_t>(it.contour.size()) * 2 > out_pts_cap)
            return 1;
        out_offs[n] = pos;
        for (const auto& p : it.contour) {
            out_pts[pos++] = p.x;
            out_pts[pos++] = p.y;
        }
        ++n;
    }
    out_offs[n] = pos;
    *out_n = n;
    return 0;
}

// Run fn(i) for i in [0, n) over up to `threads` std::threads (work
// stealing via an atomic counter). threads <= 1 runs inline. Results must
// be written to per-i slots so output order stays deterministic.
void parallel_for(int32_t n, int32_t threads,
                  const std::function<void(int32_t)>& fn) {
    if (threads <= 1 || n <= 1) {
        for (int32_t i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<int32_t> next{0};
    auto worker = [&]() {
        for (int32_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
            fn(i);
        }
    };
    std::vector<std::thread> pool;
    const int32_t n_threads = std::min<int32_t>(threads, n);
    pool.reserve(n_threads - 1);
    for (int32_t t = 1; t < n_threads; ++t) pool.emplace_back(worker);
    worker();
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// ABI version of the exported signatures below. The Python loader refuses
// a cached .so whose version differs (symbol presence alone cannot detect
// an argument inserted mid-signature). Keep in sync with
// contour_engine.py:_ABI_VERSION.
int32_t sis_abi_version() { return 2; }

// Per-mask 3x3-cross dilation + external contours over a (N, H, W) uint8
// stack, masks processed across `threads` host threads (deterministic:
// per-mask results are computed in parallel, packed in mask order).
// Output contour sets are concatenated; mask_offs (int32[N+1]) maps mask i
// to its contour index range.
int sis_dilate_find_contours(const uint8_t* masks, int32_t n_masks,
                             int32_t height, int32_t width, int32_t threads,
                             int32_t* out_pts, int64_t out_pts_cap,
                             int64_t* out_offs, int32_t out_offs_cap,
                             int32_t* mask_offs, int32_t* out_n) {
    std::vector<std::vector<std::vector<cv::Point>>> per_mask(n_masks);
    parallel_for(n_masks, threads, [&](int32_t m) {
        cv::Mat kernel =
            cv::getStructuringElement(cv::MORPH_CROSS, cv::Size(3, 3));
        cv::Mat img(height, width, CV_8U,
                    const_cast<uint8_t*>(masks) +
                        static_cast<int64_t>(m) * height * width);
        cv::Mat dilated;
        cv::morphologyEx(img, dilated, cv::MORPH_DILATE, kernel);
        cv::findContours(dilated, per_mask[m], cv::RETR_EXTERNAL,
                         cv::CHAIN_APPROX_SIMPLE);
    });
    int64_t pos = 0;
    int32_t n = 0;
    for (int32_t m = 0; m < n_masks; ++m) {
        mask_offs[m] = n;
        for (const auto& c : per_mask[m]) {
            if (n + 1 >= out_offs_cap) return 1;
            if (pos + static_cast<int64_t>(c.size()) * 2 > out_pts_cap)
                return 1;
            out_offs[n] = pos;
            for (const auto& p : c) {
                out_pts[pos++] = p.x;
                out_pts[pos++] = p.y;
            }
            ++n;
        }
    }
    mask_offs[n_masks] = n;
    out_offs[n] = pos;
    *out_n = n;
    return 0;
}

// Fixpoint merge of transitively-overlapping contours (reference
// merge_contours semantics via the round-based union-find formulation the
// Python engine uses — raster-identical, see contours.py module docstring).
int sis_merge_contours(const int32_t* pts, const int64_t* offs,
                       int32_t n_contours, int32_t only_keep_overlapping,
                       int32_t* out_pts, int64_t out_pts_cap,
                       int64_t* out_offs, int32_t out_offs_cap,
                       int32_t* out_n) {
    ContourSet in{pts, offs, n_contours};
    std::vector<Item> items;
    items.reserve(n_contours);
    for (int32_t i = 0; i < n_contours; ++i) {
        items.push_back({in.contour(i), false});
    }

    bool changed = true;
    while (changed && items.size() > 1) {
        changed = false;
        const int n = static_cast<int>(items.size());
        UnionFind uf(n);
        std::vector<cv::Rect> bounds(n);
        for (int i = 0; i < n; ++i) bounds[i] = bounds_of(items[i].contour);
        for (int i = 0; i < n; ++i) {
            for (int j = i + 1; j < n; ++j) {
                if (uf.find(i) == uf.find(j)) continue;
                if (!bboxes_overlap(bounds[i], bounds[j])) continue;
                if (overlap_count(items[i].contour, bounds[i],
                                  items[j].contour, bounds[j]) > 0) {
                    uf.unite(i, j);
                    changed = true;
                }
            }
        }
        if (!changed) break;
        // Groups in FIRST-MEMBER order (the Python engine's dict insertion
        // order), not union-find root order — keeps the output list order
        // identical to the pure path.
        std::vector<std::vector<int>> by_root(n);
        std::vector<int> order;
        order.reserve(n);
        for (int i = 0; i < n; ++i) {
            int r = uf.find(i);
            if (by_root[r].empty()) order.push_back(r);
            by_root[r].push_back(i);
        }
        std::vector<Item> next;
        next.reserve(items.size());
        for (int r : order) {
            const auto& members = by_root[r];
            if (members.size() == 1) {
                next.push_back(std::move(items[members[0]]));
                continue;
            }
            bool multi = members.size() > 1;
            std::vector<const std::vector<cv::Point>*> group;
            group.reserve(members.size());
            for (int m : members) group.push_back(&items[m].contour);
            for (auto& c : merge_group(group)) {
                next.push_back({std::move(c), multi});
            }
        }
        items = std::move(next);
    }

    return write_out(items, only_keep_overlapping != 0, out_pts, out_pts_cap,
                     out_offs, out_offs_cap, out_n);
}

// Pairwise filled-overlap pixel counts between contour sets A and B,
// written row-major into out[n_a * n_b] (the classification ranking and
// handwriting-threshold kernels; reference contour_overlap :156-181).
int sis_overlap_counts(const int32_t* pts_a, const int64_t* offs_a,
                       int32_t n_a, const int32_t* pts_b,
                       const int64_t* offs_b, int32_t n_b, int64_t* out) {
    ContourSet A{pts_a, offs_a, n_a};
    ContourSet B{pts_b, offs_b, n_b};
    std::vector<std::vector<cv::Point>> as(n_a), bs(n_b);
    std::vector<cv::Rect> ra(n_a), rb(n_b);
    for (int32_t i = 0; i < n_a; ++i) {
        as[i] = A.contour(i);
        ra[i] = bounds_of(as[i]);
    }
    for (int32_t j = 0; j < n_b; ++j) {
        bs[j] = B.contour(j);
        rb[j] = bounds_of(bs[j]);
    }
    for (int32_t i = 0; i < n_a; ++i) {
        for (int32_t j = 0; j < n_b; ++j) {
            out[static_cast<int64_t>(i) * n_b + j] =
                overlap_count(as[i], ra[i], bs[j], rb[j]);
        }
    }
    return 0;
}

// Segmentation-image painter (reference base_cluster_based_dataset_
// segmenter.py:408-450 / contours.py render_segmentation_image): canvas is
// background-colored; each contour, in caller-given order, rasterizes
// filled on the full image, is ANDed with the fine cluster mask of its
// image, and paints its class color. Later contours win on overlap —
// identical to the Python paint order when the caller flattens
// (class in fine-mask order) x (contour list order) per image.
int sis_render(const int32_t* pts, const int64_t* offs,
               const int32_t* contour_image, const int32_t* contour_color,
               int32_t n_contours, const uint8_t* fine_mask, int32_t batch,
               int32_t size, const uint8_t* colors, int32_t n_colors,
               int32_t threads, uint8_t* out) {
    const int64_t plane = static_cast<int64_t>(size) * size;
    ContourSet in{pts, offs, n_contours};
    // group contours by image: within an image, paint order (later wins)
    // must match the caller's flattening; across images painting is
    // independent and runs across `threads` host threads
    std::vector<std::vector<int32_t>> by_image(batch);
    for (int32_t i = 0; i < n_contours; ++i) {
        const int32_t b = contour_image[i];
        if (b < 0 || b >= batch || contour_color[i] < 0 ||
            contour_color[i] >= n_colors)
            return -2;
        by_image[b].push_back(i);
    }
    parallel_for(batch, threads, [&](int32_t b) {
        uint8_t* img = out + b * plane * 3;
        for (int64_t p = 0; p < plane; ++p) {
            img[p * 3 + 0] = colors[0];
            img[p * 3 + 1] = colors[1];
            img[p * 3 + 2] = colors[2];
        }
        const uint8_t* fine = fine_mask + b * plane;
        std::vector<std::vector<cv::Point>> wrap(1);
        for (int32_t i : by_image[b]) {
            wrap[0] = in.contour(i);
            // paint only inside the contour's (clamped) bounding box
            cv::Rect r = bounds_of(wrap[0]) & cv::Rect(0, 0, size, size);
            if (r.empty()) continue;
            cv::Mat cmask = cv::Mat::zeros(r.height, r.width, CV_8U);
            cv::drawContours(cmask, wrap, 0, cv::Scalar(1), cv::FILLED,
                             cv::LINE_8, cv::noArray(), INT_MAX,
                             cv::Point(-r.x, -r.y));
            const uint8_t* col =
                colors + static_cast<int64_t>(contour_color[i]) * 3;
            for (int32_t y = 0; y < r.height; ++y) {
                const uint8_t* mrow = cmask.ptr<uint8_t>(y);
                const int64_t base =
                    static_cast<int64_t>(r.y + y) * size + r.x;
                for (int32_t x = 0; x < r.width; ++x) {
                    if (mrow[x] && fine[base + x]) {
                        uint8_t* px = img + (base + x) * 3;
                        px[0] = col[0];
                        px[1] = col[1];
                        px[2] = col[2];
                    }
                }
            }
        }
    });
    return 0;
}

}  // extern "C"
