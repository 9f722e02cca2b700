// Context-modeled lossless coder for semantic/instance id maps.
//
// The reference never codes its semantic side info at all — raw label and
// instance maps are loaded from disk at the receiver (test.py never packs
// them; pix2pixHD_model.py:376-387 one-hots them from dataset tensors), so
// its flagship configuration (raw one-hot semantics + BPG visuals,
// scripts/pix2pixHD_bpg_train.sh:5-7) has no decodable bitstream. The .jpds
// v2 format packs them as PNG; this coder replaces PNG with a model built
// for what id maps ARE — piecewise-constant integer fields — and roughly
// halves-to-quarters their rate (measured in tests/test_native.py).
//
// Model, per pixel in raster order, mirrored exactly by the decoder:
//   candidates = distinct values among [left, up, up-right, up-left]
//   unary "matches candidate i?" bits, adaptive ctx = f(i, local config)
//   no match -> 32 literal bits (MSB first), adaptive ctx per bit position
// Local config for the match contexts is the boolean agreement pattern of
// (L==U, U==UR, L==UL) — flat interiors, horizontal/vertical edges, and
// diagonals each get their own adaptive models.

#include <cstdint>
#include <vector>

#include "rc_core.h"

namespace {

using jpdse_rc::Decoder;
using jpdse_rc::Encoder;
using jpdse_rc::kProbInit;

constexpr int kMaxCand = 4;
// contexts, conditional layout (kNumCtx):
//   [0, 4*8*2)        unary match bits: (min(i,3) * 8 + config) * 2 + agree
//   [4*8*2, +32)      literal value bits by position
// The unconditional coder uses the same layout with agree pinned to 0 —
// bitstreams are NOT interchangeable between the two modes (the caller's
// container magic records which was used).
constexpr int kMatchCtx = kMaxCand * 8 * 2;
constexpr int kNumCtx = kMatchCtx + 32;

struct Neigh {
  uint32_t cand[kMaxCand];
  bool agree[kMaxCand];  // does the conditioning map agree at the source?
  int n = 0;
  int cfg = 0;

  void add(uint32_t v, bool cond_agree) {
    for (int i = 0; i < n; ++i)
      if (cand[i] == v) {
        agree[i] = agree[i] || cond_agree;
        return;
      }
    cand[n] = v;
    agree[n++] = cond_agree;
  }
};

// Neighborhood of (y, x) from already-(de)coded rows of `ids`. `cond` is an
// optional already-known side map (e.g. the label map when coding the
// instance map): each candidate carries whether the cond map AGREES between
// (y, x) and the neighbor that supplied it — on real semantic maps the
// instance id matches a neighbor almost iff the label does
// (P(break | label same) ~ 2e-4, P(break | label differs) ~ 1.0, measured
// on Cityscapes), so this one bit nearly decides the match.
inline Neigh gather(const uint32_t* ids, const uint32_t* cond, int64_t w,
                    int64_t y, int64_t x) {
  Neigh nb;
  const bool has_l = x > 0, has_u = y > 0;
  const int64_t p = y * w + x;
  const uint32_t L = has_l ? ids[p - 1] : 0;
  const uint32_t U = has_u ? ids[p - w] : 0;
  const uint32_t UR = (has_u && x + 1 < w) ? ids[p - w + 1] : 0;
  const uint32_t UL = (has_l && has_u) ? ids[p - w - 1] : 0;
  const uint32_t cp = cond ? cond[p] : 0;
  if (has_l) nb.add(L, cond && cond[p - 1] == cp);
  if (has_u) nb.add(U, cond && cond[p - w] == cp);
  if (has_u && x + 1 < w) nb.add(UR, cond && cond[p - w + 1] == cp);
  if (has_l && has_u) nb.add(UL, cond && cond[p - w - 1] == cp);
  nb.cfg = ((has_l && has_u && L == U) ? 1 : 0) |
           ((has_u && x + 1 < w && U == UR) ? 2 : 0) |
           ((has_l && has_u && L == UL) ? 4 : 0);
  return nb;
}

inline int match_ctx(int i, int cfg, bool agree) {
  return ((i < 3 ? i : 3) * 8 + cfg) * 2 + (agree ? 1 : 0);
}

int64_t encode_impl(const int32_t* ids, const int32_t* cond_ids, int64_t h,
                    int64_t w, uint8_t* out, int64_t out_cap) {
  const uint32_t* u = reinterpret_cast<const uint32_t*>(ids);
  const uint32_t* cond = reinterpret_cast<const uint32_t*>(cond_ids);
  std::vector<uint16_t> probs(kNumCtx, kProbInit);
  Encoder enc(out, out_cap);
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      const uint32_t v = u[y * w + x];
      Neigh nb = gather(u, cond, w, y, x);
      bool matched = false;
      for (int i = 0; i < nb.n; ++i) {
        const int bit = (v == nb.cand[i]) ? 1 : 0;
        if (!enc.put(probs[match_ctx(i, nb.cfg, nb.agree[i])], bit))
          return -1;
        if (bit) {
          matched = true;
          break;
        }
      }
      if (!matched) {
        for (int b = 31; b >= 0; --b)
          if (!enc.put(probs[kMatchCtx + b], (v >> b) & 1u)) return -1;
      }
    }
  }
  if (!enc.flush()) return -1;
  return enc.size();
}

int64_t decode_impl(const uint8_t* data, int64_t size, int32_t* ids,
                    const int32_t* cond_ids, int64_t h, int64_t w) {
  uint32_t* u = reinterpret_cast<uint32_t*>(ids);
  const uint32_t* cond = reinterpret_cast<const uint32_t*>(cond_ids);
  std::vector<uint16_t> probs(kNumCtx, kProbInit);
  Decoder dec(data, size);
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      Neigh nb = gather(u, cond, w, y, x);
      uint32_t v = 0;
      bool matched = false;
      for (int i = 0; i < nb.n; ++i) {
        if (dec.get(probs[match_ctx(i, nb.cfg, nb.agree[i])])) {
          v = nb.cand[i];
          matched = true;
          break;
        }
      }
      if (!matched) {
        for (int b = 31; b >= 0; --b)
          v |= static_cast<uint32_t>(dec.get(probs[kMatchCtx + b])) << b;
      }
      u[y * w + x] = v;
    }
  }
  return h * w;
}

}  // namespace

extern "C" {

// Encode an h*w int32 id map. Returns bitstream size in bytes, or -1 if
// out_cap was too small. Values are coded as their uint32 bit patterns, so
// any int32 (including negatives) round-trips.
int64_t jpdse_idmap_encode(const int32_t* ids, int64_t h, int64_t w,
                           uint8_t* out, int64_t out_cap) {
  return encode_impl(ids, nullptr, h, w, out, out_cap);
}

// Decode an h*w int32 id map from a jpdse_idmap_encode bitstream.
int64_t jpdse_idmap_decode(const uint8_t* data, int64_t size, int32_t* ids,
                           int64_t h, int64_t w) {
  return decode_impl(data, size, ids, nullptr, h, w);
}

// Conditional variants: `cond` is an h*w int32 map already known to BOTH
// sides (e.g. the label map decoded earlier from the same .jpds stream)
// whose edges predict the coded map's edges. Streams are not
// interchangeable with the unconditional variant.
int64_t jpdse_idmap_encode_cond(const int32_t* ids, const int32_t* cond,
                                int64_t h, int64_t w, uint8_t* out,
                                int64_t out_cap) {
  return encode_impl(ids, cond, h, w, out, out_cap);
}

int64_t jpdse_idmap_decode_cond(const uint8_t* data, int64_t size,
                                int32_t* ids, const int32_t* cond, int64_t h,
                                int64_t w) {
  return decode_impl(data, size, ids, cond, h, w);
}

}  // extern "C"
