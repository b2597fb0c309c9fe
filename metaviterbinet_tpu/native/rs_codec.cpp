// Host-side batch Reed-Solomon codec over GF(2^8), prim poly 0x11d.
//
// The TPU path (metaviterbinet_tpu/ecc/rs.py) runs the codec on-device
// inside the online loop; this native library serves the host side of the
// framework — dataset pre-encoding, line-rate verification, CPU-only
// deployments — where the reference's scalar Python loops
// (rs_encoder.py:7-37, rs_decoder.py:37-218) are ~1000x too slow.
//
// Behavioral parity with the reference algorithm (and with ecc/rs.py, which
// is differential-fuzzed against the reference): systematic encode by LFSR
// division; decode via syndromes -> Berlekamp-Massey -> Chien root search
// -> Forney magnitudes; when BM reports a locator of degree d with
// 2d > nsym, the first n-nsym symbols are returned uncorrected and the word
// is flagged. Miscorrections on heavier error patterns are applied exactly
// as the reference applies them (corrections at whatever roots were found).
//
// C ABI (ctypes): byte-oriented batch calls, caller-allocated buffers.

#include <cstdint>
#include <cstring>

namespace {

struct GF {
    uint8_t exp[512];
    uint8_t log[256];
    constexpr static int PRIM = 0x11d;
    GF() {
        int x = 1;
        for (int i = 0; i < 255; ++i) {
            exp[i] = static_cast<uint8_t>(x);
            log[x] = static_cast<uint8_t>(i);
            x <<= 1;
            if (x & 0x100) x ^= PRIM;
        }
        for (int i = 255; i < 512; ++i) exp[i] = exp[i - 255];
        log[0] = 0;
    }
    inline uint8_t mul(uint8_t a, uint8_t b) const {
        if (!a || !b) return 0;
        return exp[log[a] + log[b]];
    }
    inline uint8_t div(uint8_t a, uint8_t b) const {
        if (!a || !b) return 0;  // caller guards b != 0
        return exp[(log[a] + 255 - log[b]) % 255];
    }
    inline uint8_t inv(uint8_t a) const { return a ? exp[255 - log[a]] : 0; }
    inline uint8_t pow2(int k) const {  // alpha^k, k >= 0
        return exp[k % 255];
    }
};

const GF gf;

constexpr int MAX_NSYM = 32;

// monic generator polynomial, highest-degree-first, length nsym+1
void generator_poly(int nsym, uint8_t* g) {
    g[0] = 1;
    int len = 1;
    for (int i = 0; i < nsym; ++i) {
        // multiply by (x + alpha^i): highest-degree-first, so
        // r[j] = g[j] + a*g[j-1] with r[0] = g[0] (stays monic)
        uint8_t a = gf.pow2(i);
        g[len] = 0;
        for (int j = len; j >= 1; --j)
            g[j] = static_cast<uint8_t>(g[j] ^ gf.mul(g[j - 1], a));
        ++len;
    }
}

// one word: systematic encode, msg[k] -> parity[nsym]
void encode_word(const uint8_t* msg, int k, int nsym, const uint8_t* g,
                 uint8_t* parity) {
    uint8_t reg[MAX_NSYM];
    std::memset(reg, 0, nsym);
    for (int i = 0; i < k; ++i) {
        uint8_t fb = static_cast<uint8_t>(msg[i] ^ reg[0]);
        std::memmove(reg, reg + 1, nsym - 1);
        reg[nsym - 1] = 0;
        if (fb)
            for (int j = 0; j < nsym; ++j)
                reg[j] = static_cast<uint8_t>(reg[j] ^ gf.mul(g[j + 1], fb));
    }
    std::memcpy(parity, reg, nsym);
}

// one word decode in place; returns 1 if flagged uncorrectable
int decode_word(uint8_t* rx, int n, int nsym) {
    // syndromes: synd[i] = rx(alpha^i), poly highest-degree-first
    uint8_t synd[MAX_NSYM];
    bool all_zero = true;
    for (int i = 0; i < nsym; ++i) {
        uint8_t s = 0;
        for (int j = 0; j < n; ++j)
            s = static_cast<uint8_t>(gf.mul(s, gf.pow2(i)) ^ rx[j]);
        synd[i] = s;
        if (s) all_zero = false;
    }
    if (all_zero) return 0;

    // Berlekamp-Massey, list form highest-degree-first (reference
    // rs_decoder.py:140-204 semantics)
    uint8_t err_loc[MAX_NSYM + 2];
    int el_len;
    {
        uint8_t el[MAX_NSYM + 2] = {1};
        int eln = 1;
        uint8_t ol[MAX_NSYM + 2] = {1};
        int oln = 1;
        for (int i = 0; i < nsym; ++i) {
            uint8_t delta = synd[i];
            for (int j = 1; j < eln && j <= i; ++j)
                delta = static_cast<uint8_t>(
                    delta ^ gf.mul(el[eln - 1 - j], synd[i - j]));
            ol[oln++] = 0;
            if (delta) {
                if (oln > eln) {
                    uint8_t nl[MAX_NSYM + 2];
                    for (int j = 0; j < oln; ++j) nl[j] = gf.mul(ol[j], delta);
                    uint8_t dinv = gf.inv(delta);
                    for (int j = 0; j < eln; ++j) ol[j] = gf.mul(el[j], dinv);
                    int tmp = oln;
                    oln = eln;
                    eln = tmp;
                    std::memcpy(el, nl, eln);
                }
                // el += delta * ol, right-aligned
                uint8_t scaled[MAX_NSYM + 2];
                for (int j = 0; j < oln; ++j) scaled[j] = gf.mul(ol[j], delta);
                int L = eln > oln ? eln : oln;
                uint8_t res[MAX_NSYM + 2] = {0};
                for (int j = 0; j < eln; ++j) res[L - eln + j] = el[j];
                for (int j = 0; j < oln; ++j)
                    res[L - oln + j] = static_cast<uint8_t>(res[L - oln + j] ^ scaled[j]);
                std::memcpy(el, res, L);
                eln = L;
            }
        }
        // drop leading zeros
        int start = 0;
        while (start < eln && el[start] == 0) ++start;
        eln -= start;
        std::memmove(el, el + start, eln);
        std::memcpy(err_loc, el, eln);
        el_len = eln;
    }

    int errs = el_len - 1;
    if (errs * 2 > nsym) return 1;  // uncorrectable: caller keeps rx prefix

    // Chien search: roots alpha^i, i in [0, n); err pos = n-1-i.
    // Convention (reference rs_main.py:34 passes err_loc[::-1] into a
    // highest-first evaluator): list position m is the POWER of x, i.e.
    // v_i = sum_m err_loc[m] * (alpha^i)^m.
    int coef_pos[MAX_NSYM];
    int n_roots = 0;
    for (int i = 0; i < n && n_roots < errs; ++i) {
        uint8_t v = 0;
        for (int m = el_len - 1; m >= 0; --m)
            v = static_cast<uint8_t>(gf.mul(v, gf.pow2(i)) ^ err_loc[m]);
        if (v == 0) coef_pos[n_roots++] = i;
    }

    // Forney: errata locator from found roots, evaluator, magnitudes
    // lambda(x) = prod_k (1 + alpha^{coef_pos_k} x), lowest-degree-first
    uint8_t lam[MAX_NSYM + 1] = {1};
    int lam_len = 1;
    for (int k2 = 0; k2 < n_roots; ++k2) {
        uint8_t a = gf.pow2(coef_pos[k2]);
        uint8_t nl[MAX_NSYM + 1] = {0};
        for (int j = 0; j < lam_len; ++j) {
            nl[j] = static_cast<uint8_t>(nl[j] ^ lam[j]);
            nl[j + 1] = static_cast<uint8_t>(nl[j + 1] ^ gf.mul(lam[j], a));
        }
        ++lam_len;
        std::memcpy(lam, nl, lam_len);
    }
    // omega = (padded-synd * lambda) mod x^(n_roots+1), where the syndrome
    // sequence carries the reference's leading shift pad: padded[0] = 0,
    // padded[m] = synd[m-1] (rs_decoder.py's synd_shift convention, mirrored
    // by ecc/rs.py's `synd` concatenation)
    uint8_t omega[MAX_NSYM + 1] = {0};
    for (int d = 0; d <= n_roots; ++d) {
        uint8_t acc = 0;
        for (int k2 = 0; k2 <= d && k2 < lam_len; ++k2) {
            int m = d - k2;
            if (m >= 1 && m - 1 < nsym)
                acc = static_cast<uint8_t>(acc ^ gf.mul(lam[k2], synd[m - 1]));
        }
        omega[d] = acc;
    }
    for (int k2 = 0; k2 < n_roots; ++k2) {
        uint8_t X = gf.pow2(coef_pos[k2]);
        uint8_t Xinv = gf.inv(X);
        // y = X * omega(Xinv)
        uint8_t om = 0;
        for (int d = n_roots; d >= 0; --d)
            om = static_cast<uint8_t>(gf.mul(om, Xinv) ^ omega[d]);
        uint8_t y = gf.mul(X, om);
        // denominator prod_{j != k} (1 + Xinv_k X_j)
        uint8_t prime = 1;
        for (int j = 0; j < n_roots; ++j) {
            if (j == k2) continue;
            prime = gf.mul(prime,
                           static_cast<uint8_t>(1 ^ gf.mul(Xinv, gf.pow2(coef_pos[j]))));
        }
        uint8_t mag = prime ? gf.div(y, prime) : 0;
        int pos = n - 1 - coef_pos[k2];
        rx[pos] = static_cast<uint8_t>(rx[pos] ^ mag);
    }
    return 0;
}

}  // namespace

extern "C" {

// Encode `count` messages of k bytes each: out[i] = msg[i] ++ parity.
// msgs: [count*k], out: [count*(k+nsym)].
void rs_encode_batch(const uint8_t* msgs, uint8_t* out, int count, int k,
                     int nsym) {
    uint8_t g[MAX_NSYM + 1];
    generator_poly(nsym, g);
    for (int i = 0; i < count; ++i) {
        const uint8_t* m = msgs + static_cast<long>(i) * k;
        uint8_t* o = out + static_cast<long>(i) * (k + nsym);
        std::memcpy(o, m, k);
        encode_word(m, k, nsym, g, o + k);
    }
}

// Decode `count` codewords of n bytes each in place semantics:
// out[i] = first n-nsym corrected bytes; flags[i] = 1 if uncorrectable
// (prefix returned unmodified, reference rs_main.py:32-33 behavior).
void rs_decode_batch(const uint8_t* rxs, uint8_t* out, uint8_t* flags,
                     int count, int n, int nsym) {
    for (int i = 0; i < count; ++i) {
        uint8_t buf[255];
        std::memcpy(buf, rxs + static_cast<long>(i) * n, n);
        int bad = decode_word(buf, n, nsym);
        flags[i] = static_cast<uint8_t>(bad);
        std::memcpy(out + static_cast<long>(i) * (n - nsym), buf, n - nsym);
    }
}

}  // extern "C"
