/* Golden-vector generator: drives the *reference* NFLlib templates
 * (/root/reference/include) with a fixed Salsa20 key and dumps every
 * intermediate polynomial byte-exactly, so nfllib_tpu's samplers, modular
 * ops, NTT, LWE pipeline and serializers can be tested for bit-identity
 * against the reference's own compiled code (not a transcription of it).
 *
 * Determinism: we link our own nfl::randombytes (below) that returns the
 * fixed key bytes 0..31 instead of /dev/urandom, so fastrandombytes'
 * Salsa20 stream is the golden stream of tools/golden/salsa20_golden.bin
 * case 1, and every sampled polynomial is reproducible.
 *
 * Output: a sequence of TLV records
 *   [u32 name_len][name][u64 data_len][data]
 * one file per config (each run of the binary is one fresh-PRNG config).
 *
 * Reference entry points exercised: poly ctors/set (core.hpp:103-391),
 * ntt_pow_phi/invntt_pow_invphi (core.hpp:594-614), expression templates
 * (ops.hpp:52-97,267-277), serialize_manually (poly.hpp:180-185), cereal
 * serialize (poly.hpp:189-191), and the LWE symmetric demo workload
 * (tests/nfllib_demo_main_op.cpp:26-58,260-331). */

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <sstream>
#include <string>

#include "nfl.hpp"

/* ---- deterministic entropy: fixed key bytes 0..31 ---------------------- */
namespace nfl {
void randombytes(unsigned char *x, unsigned long long xlen) {
  for (unsigned long long i = 0; i < xlen; i++) x[i] = (unsigned char)(i & 0xFF);
}
}

/* ---- TLV record writer -------------------------------------------------- */
static FILE *g_out = nullptr;

static void dump_bytes(const char *name, const void *data, uint64_t len) {
  uint32_t nl = (uint32_t)strlen(name);
  fwrite(&nl, 4, 1, g_out);
  fwrite(name, 1, nl, g_out);
  fwrite(&len, 8, 1, g_out);
  fwrite(data, 1, len, g_out);
}

template <class P>
static void dump_poly(const char *name, P const &p) {
  dump_bytes(name, &p(0, 0), P::degree * P::nmoduli * sizeof(typename P::value_type));
}

/* Minimal binary archive matching cereal's BinaryOutputArchive behavior for
 * a C array of arithmetic type: ar(_data) == saveBinary(_data, sizeof) ==
 * the raw little-endian bytes, no header or length prefix. */
struct MiniBinaryOutputArchive {
  std::string buf;
  template <class T, size_t N>
  void operator()(T (&arr)[N]) {
    buf.append(reinterpret_cast<const char *>(arr), sizeof(arr));
  }
};

/* ---- per-config scripted dump ------------------------------------------- */
template <size_t degree, size_t modulus, class T>
static int run() {
  using poly_t = nfl::poly_from_modulus<T, degree, modulus>;
  using value_type = typename poly_t::value_type;

  /* config identity: moduli as u64 */
  {
    uint64_t mods[poly_t::nmoduli];
    for (size_t cm = 0; cm < poly_t::nmoduli; cm++) mods[cm] = poly_t::get_modulus(cm);
    dump_bytes("moduli", mods, sizeof(mods));
  }

  poly_t &a = *new poly_t(nfl::uniform{});
  dump_poly("uniform_a", a);
  poly_t &b = *new poly_t(nfl::uniform{});
  dump_poly("uniform_b", b);

  poly_t &c = *new poly_t(a + b);
  dump_poly("add", c);
  poly_t &d = *new poly_t(a - b);
  dump_poly("sub", d);
  poly_t &e = *new poly_t(a * b);
  dump_poly("mul", e);

  poly_t &prec = *new poly_t(nfl::compute_shoup(b));
  dump_poly("shoup_prec", prec);
  poly_t &f = *new poly_t(nfl::shoup(a * b, prec));
  dump_poly("mulmod_shoup", f);
  poly_t &g = *new poly_t(a * b + c);
  dump_poly("fma", g);
  poly_t &h = *new poly_t(c + nfl::shoup(a * b, prec));
  dump_poly("fma_shoup", h);

  poly_t &nttd = *new poly_t(a);
  nttd.ntt_pow_phi();
  dump_poly("ntt", nttd);
  poly_t &back = *new poly_t(nttd);
  back.invntt_pow_invphi();
  dump_poly("intt", back);           /* == a */
  poly_t &ib = *new poly_t(b);
  ib.invntt_pow_invphi();
  dump_poly("intt_of_b", ib);        /* fresh INTT of arbitrary input */

  poly_t &nu = *new poly_t(nfl::non_uniform(4));
  dump_poly("non_uniform_4", nu);
  poly_t &nu2 = *new poly_t(nfl::non_uniform(10, 2));
  dump_poly("non_uniform_10_amp2", nu2);
  poly_t &zo = *new poly_t(nfl::ZO_dist(0x7F));
  dump_poly("zo_7f", zo);
  {
    const uint32_t hwt = degree / 2 < 64 ? degree / 2 : 64;
    poly_t &hw = *new poly_t(nfl::hwt_dist(hwt));
    char name[32];
    snprintf(name, sizeof(name), "hwt_%u", hwt);
    dump_poly(name, hw);
  }

  /* gaussian: demo generation params (nfllib_demo_main_op.cpp:141) */
  {
    nfl::FastGaussianNoise<uint8_t, T, 2> fg(20, 128, 1 << 14);
    poly_t &ga = *new poly_t(nfl::gaussian<uint8_t, T, 2>(&fg));
    dump_poly("gaussian_s20", ga);
    poly_t &gb = *new poly_t(nfl::gaussian<uint8_t, T, 2>(&fg, 2));
    dump_poly("gaussian_s20_amp2", gb);
  }

  /* LWE symmetric transcript (nfllib_demo_main_op.cpp:260-331, SIGMA=4) */
  {
    nfl::FastGaussianNoise<uint8_t, T, 2> g_prng(4, 128, 1 << 10);

    poly_t &s = *new poly_t(nfl::gaussian<uint8_t, T, 2>(&g_prng));
    s.ntt_pow_phi();
    dump_poly("lwe_s", s);
    poly_t &sprime = *new poly_t(nfl::compute_shoup(s));
    dump_poly("lwe_sprime", sprime);

    poly_t &pka = *new poly_t(nfl::uniform{});
    dump_poly("lwe_pka", pka);
    poly_t &pkb = *new poly_t(nfl::gaussian<uint8_t, T, 2>(&g_prng, 2));
    pkb.ntt_pow_phi();
    pkb = pkb + nfl::shoup(pka * s, sprime);
    dump_poly("lwe_pkb", pkb);

    /* one encryption of zero */
    poly_t &u = *new poly_t(nfl::gaussian<uint8_t, T, 2>(&g_prng));
    u.ntt_pow_phi();
    poly_t &e1 = *new poly_t(nfl::gaussian<uint8_t, T, 2>(&g_prng, 2));
    e1.ntt_pow_phi();
    poly_t &e2 = *new poly_t(nfl::gaussian<uint8_t, T, 2>(&g_prng, 2));
    e2.ntt_pow_phi();
    poly_t &resa = *new poly_t(u * pka + e1);
    poly_t &resb = *new poly_t(u * pkb + e2);
    dump_poly("lwe_resa", resa);
    dump_poly("lwe_resb", resb);

    /* decrypt (nfllib_demo_main_op.cpp:48-58) */
    poly_t &tmp = *new poly_t(resb - resa * s);
    tmp.invntt_pow_invphi();
    dump_poly("lwe_dec_raw", tmp);
    const value_type p0 = poly_t::get_modulus(0);
    for (auto &v : tmp) {
      v = (v < p0 / 2) ? v % 2 : 1 - v % 2;
    }
    dump_poly("lwe_dec_bits", tmp);
  }

  /* serializers: manual stream (poly.hpp:180-185) and cereal-format
   * binary archive (poly.hpp:189-191) of the same poly */
  {
    std::ostringstream os;
    c.serialize_manually(os);
    const std::string bytes = os.str();
    dump_bytes("serialize_manual", bytes.data(), bytes.size());

    MiniBinaryOutputArchive ar;
    c.serialize(ar);
    dump_bytes("cereal_binary", ar.buf.data(), ar.buf.size());
  }

  return 0;
}

int main(int argc, char **argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s <config> <out.bin>\n", argv[0]);
    return 2;
  }
  g_out = fopen(argv[2], "wb");
  if (!g_out) {
    perror("fopen");
    return 2;
  }
  const std::string cfg = argv[1];
  int rc = 2;
  /* the reference CI matrix (tests/CMakeLists.txt:1-7) + BASELINE configs */
  if (cfg == "8_60_u32") rc = run<8, 60, uint32_t>();
  else if (cfg == "128_14_u16") rc = run<128, 14, uint16_t>();
  else if (cfg == "1024_60_u32") rc = run<1024, 60, uint32_t>();
  else if (cfg == "8192_124_u64") rc = run<8192, 124, uint64_t>();
  else if (cfg == "32768_124_u64") rc = run<32768, 124, uint64_t>();
  else if (cfg == "4096_60_u32") rc = run<4096, 60, uint32_t>();
  else if (cfg == "16384_496_u64") rc = run<16384, 496, uint64_t>();
  else fprintf(stderr, "unknown config %s\n", cfg.c_str());
  fclose(g_out);
  return rc;
}
