// Native decoder for the CRAM 3.1 adaptive arithmetic codec (block
// compression method 6) — a port of the validated Python implementation in
// io/arith.py (reference behavior: htslib cram/arith_dynamic.c).
//
// Decode-only: CRAM writing stays on the Python side.  The EXT transform
// (0x80, an embedded bzip2 stream) returns failure so the caller falls
// back to the Python path — bzip2 is not linked into this library.
//
// Used twice by the native CRAM -> BAM converter: method-6 blocks, and
// arith-backed tok3 name-token streams (clair3t_rans_nx16.cc).

#include <cstdint>
#include <cstring>
#include <vector>

namespace c3arith {

constexpr int F_ORDER1 = 0x01;
constexpr int F_STRIPE = 0x04;
constexpr int F_NOSZ = 0x08;
constexpr int F_CAT = 0x10;
constexpr int F_RLE = 0x20;
constexpr int F_PACK = 0x40;
constexpr int F_EXT = 0x80;

constexpr uint32_t kMaxTotal = (1u << 16) - 16;
constexpr uint32_t kStep = 16;

struct Cur {
  const uint8_t* d;
  size_t n;
  size_t p = 0;
  bool fail = false;

  uint8_t u8() {
    if (p >= n) { fail = true; return 0; }
    return d[p++];
  }
};

inline uint64_t read_uint7(Cur& c) {
  uint64_t v = 0;
  for (int k = 0; k < 10; k++) {
    uint8_t b = c.u8();
    if (c.fail) return 0;
    v = (v << 7) | (b & 0x7F);
    if (!(b & 0x80)) return v;
  }
  c.fail = true;
  return 0;
}

// Shelwien/Subbotin byte-wise range decoder (io/arith.py RangeDecoder):
// 32-bit range, primed with five bytes (the first is the encoder's zero
// cache).
struct RangeDecoder {
  Cur* c;
  uint32_t range = 0xFFFFFFFF;
  uint32_t code = 0;

  explicit RangeDecoder(Cur* cur) : c(cur) {
    uint64_t x = 0;
    for (int i = 0; i < 5; i++) x = (x << 8) | byte();
    code = (uint32_t)x;
  }

  inline uint8_t byte() {
    // reads past the payload end return 0 (matching the Python decoder)
    return c->p < c->n ? c->d[c->p++] : 0;
  }

  inline uint32_t get_freq(uint32_t tot) {
    range /= tot;
    uint32_t f = code / range;
    return f < tot - 1 ? f : tot - 1;
  }

  inline void decode(uint32_t cum, uint32_t freq) {
    code -= cum * range;
    range *= freq;
    while (range < (1u << 24)) {
      range <<= 8;
      code = (code << 8) | byte();
    }
  }
};

// Adaptive symbol model (htslib c_simple_model.h semantics): +16 per hit,
// halving renormalize past 2^16-16, one bubble step toward the front.
struct SimpleModel {
  std::vector<uint16_t> freqs;
  std::vector<uint16_t> syms;
  uint32_t total;

  void init(int nsym) {
    freqs.assign(nsym, 1);
    syms.resize(nsym);
    for (int i = 0; i < nsym; i++) syms[i] = (uint16_t)i;
    total = (uint32_t)nsym;
  }

  inline void bump(size_t x) {
    freqs[x] += kStep;
    total += kStep;
    if (total > kMaxTotal) {
      total = 0;
      for (auto& f : freqs) {
        f -= f >> 1;
        total += f;
      }
    }
    if (x > 0 && freqs[x] > freqs[x - 1]) {
      std::swap(freqs[x], freqs[x - 1]);
      std::swap(syms[x], syms[x - 1]);
    }
  }

  inline int decode(RangeDecoder& rc) {
    uint32_t f = rc.get_freq(total);
    size_t x = 0;
    uint32_t acc = 0;
    while (acc + freqs[x] <= f) acc += freqs[x++];
    rc.decode(acc, freqs[x]);
    int sym = syms[x];
    bump(x);
    return sym;
  }
};

bool o0_decode(Cur& c, size_t out_sz, uint8_t* out) {
  int nsym = c.u8();
  if (c.fail) return false;
  if (nsym == 0) nsym = 256;
  SimpleModel model;
  model.init(nsym);
  RangeDecoder rc(&c);
  for (size_t i = 0; i < out_sz; i++) out[i] = (uint8_t)model.decode(rc);
  return true;
}

bool o1_decode(Cur& c, size_t out_sz, uint8_t* out) {
  int nsym = c.u8();
  if (c.fail) return false;
  if (nsym == 0) nsym = 256;
  std::vector<SimpleModel> models(nsym);
  for (auto& m : models) m.init(nsym);
  RangeDecoder rc(&c);
  int last = 0;
  for (size_t i = 0; i < out_sz; i++) {
    if (last >= nsym) return false;
    last = models[last].decode(rc);
    out[i] = (uint8_t)last;
  }
  return true;
}

bool rle_decode(Cur& c, size_t out_sz, int order, uint8_t* out) {
  int nsym = c.u8();
  if (c.fail) return false;
  if (nsym == 0) nsym = 256;
  std::vector<SimpleModel> lits(order ? nsym : 1);
  for (auto& m : lits) m.init(nsym);
  // run models: one per literal, then shared continuation contexts
  std::vector<SimpleModel> runs(nsym + 2);
  for (auto& m : runs) m.init(256);
  RangeDecoder rc(&c);
  size_t i = 0;
  int last = 0;
  while (i < out_sz) {
    int b = lits[order ? last : 0].decode(rc);
    last = b;
    out[i++] = (uint8_t)b;
    uint64_t run = 0;
    int rctx = b;
    for (;;) {
      int part = runs[rctx].decode(rc);
      run += (uint64_t)part;
      rctx = (rctx == b) ? nsym : nsym + 1;
      if (part != 255) break;
    }
    if (i + run > out_sz) return false;
    memset(out + i, b, run);
    i += run;
  }
  return true;
}

bool decompress(const uint8_t* in, size_t in_len, uint8_t* out,
                size_t out_len) {
  Cur c{in, in_len};
  int flags = c.u8();
  if (c.fail) return false;
  size_t out_sz = out_len;
  if (!(flags & F_NOSZ)) {
    out_sz = (size_t)read_uint7(c);
    if (c.fail || out_sz != out_len) return false;
  }

  if (flags & F_STRIPE) {
    int X = c.u8();
    if (c.fail || X <= 0 || X > 64) return false;
    std::vector<uint64_t> clens(X);
    for (int j = 0; j < X; j++) clens[j] = read_uint7(c);
    if (c.fail) return false;
    std::vector<uint8_t> sub;
    for (int j = 0; j < X; j++) {
      size_t ulen = out_sz / X + ((out_sz % X) > (size_t)j ? 1 : 0);
      if (c.p + clens[j] > c.n) return false;
      sub.resize(ulen);
      if (!decompress(c.d + c.p, clens[j], sub.data(), ulen)) return false;
      c.p += clens[j];
      for (size_t i = 0; i < ulen; i++) out[i * X + j] = sub[i];
    }
    return true;
  }

  bool has_pack = flags & F_PACK;
  uint8_t pmap[256];
  int nsym = 0;
  size_t final_len = out_sz;
  if (has_pack) {
    nsym = c.u8();
    if (c.fail || nsym > 16) return false;
    for (int i = 0; i < nsym; i++) pmap[i] = c.u8();
    out_sz = (size_t)read_uint7(c);
    if (c.fail) return false;
  }

  std::vector<uint8_t> stage;
  uint8_t* target = out;
  if (has_pack) {
    stage.resize(out_sz);
    target = stage.data();
  }

  if (flags & F_CAT) {
    if (c.p + out_sz > c.n) return false;
    memcpy(target, c.d + c.p, out_sz);
  } else if (flags & F_EXT) {
    return false;  // bzip2 transform -> Python fallback
  } else if (out_sz == 0) {
    // nothing
  } else if (flags & F_RLE) {
    if (!rle_decode(c, out_sz, flags & F_ORDER1, target)) return false;
  } else if (flags & F_ORDER1) {
    if (!o1_decode(c, out_sz, target)) return false;
  } else {
    if (!o0_decode(c, out_sz, target)) return false;
  }

  if (has_pack) {  // same bit-unpack as rANS-Nx16 (io/rans_nx16.py)
    size_t fl = final_len;
    if (nsym <= 1) {
      if (nsym == 0 && fl > 0) return false;
      memset(out, nsym ? pmap[0] : 0, fl);
    } else if (nsym <= 2) {
      for (size_t i = 0; i < fl; i++)
        out[i] = pmap[(target[i >> 3] >> (i & 7)) & 1];
    } else if (nsym <= 4) {
      for (size_t i = 0; i < fl; i++)
        out[i] = pmap[(target[i >> 2] >> ((i & 3) * 2)) & 3];
    } else {
      for (size_t i = 0; i < fl; i++)
        out[i] = pmap[(target[i >> 1] >> ((i & 1) * 4)) & 15];
    }
  }
  return true;
}

}  // namespace c3arith

extern "C" {

// Decode an adaptive-arithmetic payload into exactly out_sz bytes.
// Returns 0 on success, 1 on failure/unsupported (caller falls back).
int clair3t_arith_decode(const uint8_t* payload, int64_t payload_len,
                         uint8_t* out, int64_t out_sz) {
  if (payload_len <= 0 || out_sz < 0) return 1;
  return c3arith::decompress(payload, (size_t)payload_len, out,
                             (size_t)out_sz)
             ? 0
             : 1;
}

}  // extern "C"
