// Dennis Lee v3 color quantizer — fresh C++ implementation of the behavior
// the reference gets from dlquant_dll.dll (/root/reference/dlquant/
// quantizer.c:437-663, dl3quant + build_table3/reduce_table3/set_palette3).
//
// Algorithm: histogram the pixels into (1<<bpc)^3 bins keyed by the top
// `bpc` bits of each component; compact used bins (ascending bin index);
// then greedily merge the pair of entries minimizing a pixel-count-weighted
// error until `quant_to` entries remain. The pairwise error of (i,j) is
//   err = |mean(i+j) - mean(i)| * count(i) + |mean(j) - mean(i+j)| * count(j)
// with integer rounded means and float32 sqrt, matching the reference's
// calc_err. The incremental err/cc bookkeeping (each entry caches its best
// partner among LATER entries; fixups on merge mirror reduce_table3) is
// reproduced so the merge order — and therefore the palette — matches.
//
// C API: tiler_dl3_quant(rgb, n_pixels, quant_to, lookup_bpc, out_pal)
//   rgb: n_pixels*3 bytes; out_pal: quant_to*3 bytes (r,g,b rows).
//   Returns number of palette entries actually produced (may be < quant_to
//   when the input has fewer distinct bins).

#include <algorithm>
#include <cmath>
#include <climits>
#include <cstdint>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Entry {
  int64_t r, g, b;      // component sums
  int64_t count;        // pixel count
  int rr, gg, bb;       // rounded means
  float err;            // best merge error with partner cc (cc > index)
  int cc;               // best partner index
};

inline void set_mean(Entry& e) {
  int64_t v2 = e.count >> 1;
  e.rr = int((e.r + v2) / e.count);
  e.gg = int((e.g + v2) / e.count);
  e.bb = int((e.b + v2) / e.count);
}

// Exact truncating int64 division via double with +-1 correction: int64
// hardware division dominates the O(C^2) pair scans; a double divide plus
// fixup is exact for the value ranges here (sums < 2^53) and much faster.
inline int64_t fast_div(int64_t num, int64_t den) {
  int64_t q = int64_t(double(num) / double(den));
  if (q * den > num) --q;
  else if ((q + 1) * den <= num) ++q;
  return q;
}

inline float calc_err(const std::vector<Entry>& t, int c1, int c2) {
  const Entry &a = t[c1], &b = t[c2];
  int64_t p1 = a.count, p2 = b.count, p3 = p1 + p2;
  int r3 = int(fast_div(a.r + b.r + (p3 >> 1), p3));
  int g3 = int(fast_div(a.g + b.g + (p3 >> 1), p3));
  int b3 = int(fast_div(a.b + b.b + (p3 >> 1), p3));
  float d1 = float((r3 - a.rr) * (r3 - a.rr) + (g3 - a.gg) * (g3 - a.gg) +
                   (b3 - a.bb) * (b3 - a.bb));
  float d2 = float((b.rr - r3) * (b.rr - r3) + (b.gg - g3) * (b.gg - g3) +
                   (b.bb - b3) * (b.bb - b3));
  return sqrtf(d1) * float(p1) + sqrtf(d2) * float(p2);
}

void recount_next(std::vector<Entry>& t, int tot, int i) {
  float err = HUGE_VALF;
  int c2 = 0;
  for (int j = i + 1; j < tot; j++) {
    float e = calc_err(t, i, j);
    if (e < err) { err = e; c2 = j; }
  }
  t[i].err = err;
  t[i].cc = c2;
}

void recount_dist(std::vector<Entry>& t, int tot, int c1) {
  recount_next(t, tot, c1);
  for (int i = 0; i < c1; i++) {
    if (t[i].cc == c1) {
      recount_next(t, tot, i);
    } else {
      float e = calc_err(t, i, c1);
      if (e < t[i].err) { t[i].err = e; t[i].cc = c1; }
    }
  }
}

}  // namespace

int reduce_entries(std::vector<Entry>& t, int quant_to, uint8_t* out_pal,
                   int max_out);

extern "C" {

int tiler_dl3_quant(const uint8_t* rgb, int64_t n_pixels, int quant_to,
                    int lookup_bpc, uint8_t* out_pal) {
  std::memset(out_pal, 0, size_t(quant_to) * 3);
  if (n_pixels <= 0 || lookup_bpc < 1 || lookup_bpc > 8) return 0;

  const int mbpc = (1 << lookup_bpc) - 1;
  const size_t n_bins = size_t(1) << (lookup_bpc * 3);
  std::vector<int64_t> hr(n_bins, 0), hg(n_bins, 0), hb(n_bins, 0),
      hc(n_bins, 0);
  for (int64_t i = 0; i < n_pixels; i++) {
    int r = rgb[i * 3 + 0], g = rgb[i * 3 + 1], b = rgb[i * 3 + 2];
    size_t idx = size_t(b * mbpc / 255) |
                 (size_t(g * mbpc / 255) << lookup_bpc) |
                 (size_t(r * mbpc / 255) << (lookup_bpc * 2));
    hr[idx] += r; hg[idx] += g; hb[idx] += b; hc[idx]++;
  }

  std::vector<Entry> t;
  for (size_t i = 0; i < n_bins; i++) {
    if (hc[i]) {
      Entry e{hr[i], hg[i], hb[i], hc[i], 0, 0, 0, HUGE_VALF, 0};
      set_mean(e);
      t.push_back(e);
    }
  }
  return reduce_entries(t, quant_to, out_pal, quant_to);
}

// DL3 with an internal bin cap: when the histogram holds more than `cap`
// distinct bins, the long tail of rare bins pre-merges into its nearest
// high-count bin (squared-RGB on rounded means) before the exact greedy
// runs — bounding the O(C^2) pair scans. cap <= 0 disables capping.
int tiler_dl3_quant_capped(const uint8_t* rgb, int64_t n_pixels,
                           int quant_to, int lookup_bpc, int cap,
                           uint8_t* out_pal) {
  std::memset(out_pal, 0, size_t(quant_to) * 3);
  if (n_pixels <= 0 || lookup_bpc < 1 || lookup_bpc > 8) return 0;

  const int mbpc = (1 << lookup_bpc) - 1;
  const size_t n_bins = size_t(1) << (lookup_bpc * 3);
  std::vector<int64_t> hr(n_bins, 0), hg(n_bins, 0), hb(n_bins, 0),
      hc(n_bins, 0);
  for (int64_t i = 0; i < n_pixels; i++) {
    int r = rgb[i * 3 + 0], g = rgb[i * 3 + 1], b = rgb[i * 3 + 2];
    size_t idx = size_t(b * mbpc / 255) |
                 (size_t(g * mbpc / 255) << lookup_bpc) |
                 (size_t(r * mbpc / 255) << (lookup_bpc * 2));
    hr[idx] += r; hg[idx] += g; hb[idx] += b; hc[idx]++;
  }

  std::vector<Entry> t;
  for (size_t i = 0; i < n_bins; i++) {
    if (hc[i]) {
      Entry e{hr[i], hg[i], hb[i], hc[i], 0, 0, 0, HUGE_VALF, 0};
      set_mean(e);
      t.push_back(e);
    }
  }

  if (cap > 0 && int(t.size()) > cap) {
    // order bins by count desc (stable: bin-index asc); keep the head
    std::vector<int> order(t.size());
    for (size_t i = 0; i < t.size(); i++) order[i] = int(i);
    std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
      return t[a].count > t[b].count;
    });
    std::vector<char> kept(t.size(), 0);
    std::vector<int> keep(order.begin(), order.begin() + cap);
    std::sort(keep.begin(), keep.end());  // ascending bin-index compaction
    for (int i : keep) kept[i] = 1;
    for (size_t i = 0; i < t.size(); i++) {
      if (kept[i]) continue;
      // nearest kept bin by squared RGB of rounded means (first min wins)
      int64_t best = INT64_MAX;
      int tgt = keep[0];
      for (int j : keep) {
        int64_t dr = t[i].rr - t[j].rr, dg = t[i].gg - t[j].gg,
                db = t[i].bb - t[j].bb;
        int64_t d = dr * dr + dg * dg + db * db;
        if (d < best) { best = d; tgt = j; }
      }
      t[tgt].r += t[i].r; t[tgt].g += t[i].g; t[tgt].b += t[i].b;
      t[tgt].count += t[i].count;
    }
    std::vector<Entry> capped;
    capped.reserve(keep.size());
    for (int i : keep) {
      set_mean(t[i]);
      capped.push_back(t[i]);
    }
    t.swap(capped);
  }
  return reduce_entries(t, quant_to, out_pal, quant_to);
}

// Same greedy reduction but starting from pre-aggregated bins (sums +
// counts), in the given order. Lets the host cap the O(C^2) pair scans by
// pre-merging the long tail of rare bins before the exact greedy runs.
int tiler_dl3_quant_bins(const int64_t* r_sums, const int64_t* g_sums,
                         const int64_t* b_sums, const int64_t* counts,
                         int64_t n, int quant_to, uint8_t* out_pal) {
  std::memset(out_pal, 0, size_t(quant_to) * 3);
  std::vector<Entry> t;
  t.reserve(size_t(n));
  for (int64_t i = 0; i < n; i++) {
    if (counts[i] <= 0) continue;
    Entry e{r_sums[i], g_sums[i], b_sums[i], counts[i], 0, 0, 0,
            HUGE_VALF, 0};
    set_mean(e);
    t.push_back(e);
  }
  return reduce_entries(t, quant_to, out_pal, quant_to);
}

}  // extern "C"

int reduce_entries(std::vector<Entry>& t, int quant_to, uint8_t* out_pal,
                   int max_out) {
  int tot = int(t.size());

  if (tot > quant_to) {
    for (int i = 0; i < tot - 1; i++) recount_next(t, tot, i);
    t[tot - 1].err = HUGE_VALF;
    t[tot - 1].cc = tot;

    while (tot > quant_to) {
      // first strict minimum in scan order, as in reduce_table3
      float err = HUGE_VALF;
      int c1 = 0;
      for (int i = 0; i < tot; i++) {
        if (t[i].err < err) { err = t[i].err; c1 = i; }
      }
      int c2 = t[c1].cc;
      t[c2].r += t[c1].r; t[c2].g += t[c1].g; t[c2].b += t[c1].b;
      t[c2].count += t[c1].count;
      set_mean(t[c2]);
      tot--;
      t[c1] = t[tot];
      t[tot - 1].err = HUGE_VALF;
      t[tot - 1].cc = tot;
      for (int i = 0; i < c1; i++) {
        if (t[i].cc == tot) t[i].cc = c1;
      }
      for (int i = c1 + 1; i < tot; i++) {
        if (t[i].cc == tot) recount_next(t, tot, i);
      }
      recount_dist(t, tot, c1);
      if (c2 != tot) recount_dist(t, tot, c2);
    }
  }

  for (int i = 0; i < tot && i < max_out; i++) {
    out_pal[i * 3 + 0] = uint8_t(t[i].rr);
    out_pal[i * 3 + 1] = uint8_t(t[i].gg);
    out_pal[i * 3 + 2] = uint8_t(t[i].bb);
  }
  return tot < max_out ? tot : max_out;
}
