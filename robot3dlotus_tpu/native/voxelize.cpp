// Host-side voxel-grid downsample with trace — the C++ equivalent of the
// reference's open3d voxel_down_sample_and_trace (C++ under the hood,
// utils/point_cloud.py:8-17). One pass builds an open-addressing hash map
// over packed 21-bit/axis grid keys accumulating per-voxel mean and first
// (minimum) member index; a final sort by packed key reproduces the
// numpy-unique lexicographic voxel order of ops/voxel.py so the two
// implementations are bit-interchangeable.
//
// Built by robot3dlotus_tpu/native/__init__.py with:
//   g++ -O3 -march=native -shared -fPIC voxelize.cpp -o _voxelize.so
#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

struct Slot {
    int64_t key;      // packed grid key, -1 = empty
    double sx, sy, sz;
    int64_t count;
    int64_t first;    // min input index
};

inline uint64_t mix(uint64_t k) {
    // splitmix64 finalizer — good avalanche for packed grid keys
    k += 0x9e3779b97f4a7c15ull;
    k = (k ^ (k >> 30)) * 0xbf58476d1ce4e5b9ull;
    k = (k ^ (k >> 27)) * 0x94d049bb133111ebull;
    return k ^ (k >> 31);
}

}  // namespace

extern "C" {

// xyz: (n, 3) float32. Outputs: means (M, 3) float32, first (M,) int64.
// Caller allocates means/first with capacity n. Returns M (voxel count),
// or -1 if any grid coordinate exceeds 21 bits.
long voxelize_trace(const float* xyz, long n, float voxel_size,
                    float* means_out, long long* first_out) {
    if (n <= 0) return 0;
    float ox = xyz[0], oy = xyz[1], oz = xyz[2];
    for (long i = 1; i < n; ++i) {
        ox = std::min(ox, xyz[3 * i + 0]);
        oy = std::min(oy, xyz[3 * i + 1]);
        oz = std::min(oz, xyz[3 * i + 2]);
    }

    size_t cap = 16;
    while (cap < static_cast<size_t>(n) * 2) cap <<= 1;
    std::vector<Slot> table(cap);
    for (auto& s : table) s.key = -1;
    const size_t mask = cap - 1;

    long m = 0;
    for (long i = 0; i < n; ++i) {
        // match numpy bit-for-bit: float32 subtract, float32 divide,
        // float32 floor, then int64 cast (ops/voxel.py:25-26)
        const int64_t gx = static_cast<int64_t>(
            std::floor((xyz[3 * i + 0] - ox) / voxel_size));
        const int64_t gy = static_cast<int64_t>(
            std::floor((xyz[3 * i + 1] - oy) / voxel_size));
        const int64_t gz = static_cast<int64_t>(
            std::floor((xyz[3 * i + 2] - oz) / voxel_size));
        if ((gx | gy | gz) >> 21) return -1;
        const int64_t key = (gx << 42) | (gy << 21) | gz;

        size_t h = mix(static_cast<uint64_t>(key)) & mask;
        while (true) {
            Slot& s = table[h];
            if (s.key == key) {
                s.sx += xyz[3 * i + 0];
                s.sy += xyz[3 * i + 1];
                s.sz += xyz[3 * i + 2];
                s.count += 1;
                if (i < s.first) s.first = i;
                break;
            }
            if (s.key == -1) {
                s.key = key;
                s.sx = xyz[3 * i + 0];
                s.sy = xyz[3 * i + 1];
                s.sz = xyz[3 * i + 2];
                s.count = 1;
                s.first = i;
                ++m;
                break;
            }
            h = (h + 1) & mask;
        }
    }

    // voxel order: ascending packed key == np.unique's lexicographic
    // (gx, gy, gz) row order (all fields non-negative)
    std::vector<const Slot*> occ;
    occ.reserve(m);
    for (const auto& s : table)
        if (s.key != -1) occ.push_back(&s);
    std::sort(occ.begin(), occ.end(),
              [](const Slot* a, const Slot* b) { return a->key < b->key; });

    for (long j = 0; j < m; ++j) {
        const Slot* s = occ[j];
        means_out[3 * j + 0] = static_cast<float>(s->sx / s->count);
        means_out[3 * j + 1] = static_cast<float>(s->sy / s->count);
        means_out[3 * j + 2] = static_cast<float>(s->sz / s->count);
        first_out[j] = s->first;
    }
    return m;
}

// Fused workspace crop + voxelize: drops points outside the axis-aligned
// workspace box (and below the table) before hashing — the exact pipeline
// head of eval preprocessing (eval_simple_policy.py:156-176) in one pass.
// keep_out: (n,) uint8 mask of points that survived the crop.
long crop_voxelize_trace(const float* xyz, long n, float voxel_size,
                         const float* bbox,  // x0,x1,y0,y1,z0,z1,table_z
                         int rm_table,
                         float* means_out, long long* first_out,
                         unsigned char* keep_out) {
    std::vector<float> kept;
    std::vector<long long> orig_idx;
    kept.reserve(3 * n);
    orig_idx.reserve(n);
    const float zmin = rm_table ? std::max(bbox[4], bbox[6]) : bbox[4];
    for (long i = 0; i < n; ++i) {
        const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
        const bool ok = x > bbox[0] && x < bbox[1] && y > bbox[2] &&
                        y < bbox[3] && z > zmin && z < bbox[5];
        keep_out[i] = ok;
        if (ok) {
            kept.push_back(x); kept.push_back(y); kept.push_back(z);
            orig_idx.push_back(i);
        }
    }
    const long nk = static_cast<long>(orig_idx.size());
    if (nk == 0) return 0;
    long m = voxelize_trace(kept.data(), nk, voxel_size, means_out,
                            first_out);
    for (long j = 0; j < m; ++j)  // trace back to ORIGINAL indices
        first_out[j] = orig_idx[static_cast<size_t>(first_out[j])];
    return m;
}

}  // extern "C"
