// hacktv_tpu native runtime: host-side streaming components that sit between
// the TPU synthesis pipeline (which hands back whole blocks of int16 IQ) and
// the byte-oriented sinks (files, pipes, SDR hardware).
//
// This is the TPU-native replacement for the reference's realtime plumbing
// (fifo.c block FIFO, rf_file.c sample converters, rf_hackrf.c int8/HackDAC
// packing, rf_fl2k.c 8-bit DAC dither): same observable byte formats, but a
// block-streaming design — the device produces multi-frame blocks, a single
// writer thread drains a bounded byte FIFO to the sink so format conversion
// and IO overlap with the next block's device compute.
//
// Built as a plain C ABI shared library, bound from Python with ctypes.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <new>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Bounded byte FIFO (single writer, single reader), with prefill threshold
// and EOF semantics matching the reference's fifo.c contract
// (/root/reference/src/fifo.c:24-321): reads block until `prefill` bytes are
// buffered the first time, writes block while full, a closed+drained FIFO
// returns 0 (EOF) to the reader.
// ---------------------------------------------------------------------------

struct rt_fifo {
    std::vector<uint8_t> buf;
    size_t cap = 0;
    size_t head = 0;   // read position
    size_t len = 0;    // bytes available
    size_t prefill = 0;
    bool prefilled = false;
    bool closed = false;      // writer closed (EOF once drained)
    bool abort = false;       // reader gone; writer should stop
    std::mutex m;
    std::condition_variable cv_r, cv_w;
};

rt_fifo *rt_fifo_create(size_t capacity, size_t prefill) {
    rt_fifo *f = new (std::nothrow) rt_fifo;
    if (!f) return nullptr;
    f->buf.resize(capacity);
    f->cap = capacity;
    f->prefill = prefill < capacity ? prefill : capacity;
    f->prefilled = (prefill == 0);
    return f;
}

void rt_fifo_destroy(rt_fifo *f) { delete f; }

// Blocking write of n bytes. Returns n, or -1 if the reader aborted.
long rt_fifo_write(rt_fifo *f, const uint8_t *data, size_t n) {
    size_t done = 0;
    std::unique_lock<std::mutex> lk(f->m);
    while (done < n) {
        f->cv_w.wait(lk, [&] { return f->len < f->cap || f->abort; });
        if (f->abort) return -1;
        size_t space = f->cap - f->len;
        size_t chunk = n - done < space ? n - done : space;
        size_t tail = (f->head + f->len) % f->cap;
        size_t first = chunk < f->cap - tail ? chunk : f->cap - tail;
        memcpy(&f->buf[tail], data + done, first);
        if (chunk > first) memcpy(&f->buf[0], data + done + first, chunk - first);
        f->len += chunk;
        done += chunk;
        if (!f->prefilled && f->len >= f->prefill) f->prefilled = true;
        if (f->prefilled) f->cv_r.notify_one();
    }
    return (long)done;
}

// Blocking read of up to n bytes (at least 1 unless EOF). Returns bytes
// read, or 0 at EOF (writer closed and FIFO drained).
long rt_fifo_read(rt_fifo *f, uint8_t *out, size_t n) {
    std::unique_lock<std::mutex> lk(f->m);
    f->cv_r.wait(lk, [&] {
        return (f->prefilled && f->len > 0) || f->closed || f->abort;
    });
    if (f->abort) return -1;
    if (f->len == 0) return 0;  // closed + drained = EOF
    size_t chunk = n < f->len ? n : f->len;
    size_t first = chunk < f->cap - f->head ? chunk : f->cap - f->head;
    memcpy(out, &f->buf[f->head], first);
    if (chunk > first) memcpy(out + first, &f->buf[0], chunk - first);
    f->head = (f->head + chunk) % f->cap;
    f->len -= chunk;
    f->cv_w.notify_one();
    return (long)chunk;
}

// Non-blocking read for realtime consumers (USB callbacks): returns what is
// available now (0 = underrun while open, -1 = EOF).
long rt_fifo_read_nowait(rt_fifo *f, uint8_t *out, size_t n) {
    std::unique_lock<std::mutex> lk(f->m);
    if (f->len == 0 || !f->prefilled) return f->closed && f->len == 0 ? -1 : 0;
    size_t chunk = n < f->len ? n : f->len;
    size_t first = chunk < f->cap - f->head ? chunk : f->cap - f->head;
    memcpy(out, &f->buf[f->head], first);
    if (chunk > first) memcpy(out + first, &f->buf[0], chunk - first);
    f->head = (f->head + chunk) % f->cap;
    f->len -= chunk;
    f->cv_w.notify_one();
    return (long)chunk;
}

void rt_fifo_close_writer(rt_fifo *f) {
    std::lock_guard<std::mutex> lk(f->m);
    f->closed = true;
    f->prefilled = true;  // EOF releases a reader waiting on prefill
    f->cv_r.notify_all();
}

void rt_fifo_abort(rt_fifo *f) {
    std::lock_guard<std::mutex> lk(f->m);
    f->abort = true;
    f->cv_r.notify_all();
    f->cv_w.notify_all();
}

long rt_fifo_level(rt_fifo *f) {
    std::lock_guard<std::mutex> lk(f->m);
    return (long)f->len;
}

// ---------------------------------------------------------------------------
// Sample format conversion kernels. Input is interleaved int16 I/Q pairs;
// `samples` counts IQ pairs. Semantics match rf_file.c:34-277: "real"
// output keeps the I channel only; u8/s8 keep the top 8 bits; u16 offsets
// by 32768; s32 shifts into the top 16 bits; f32 scales by 1/32767.
// ---------------------------------------------------------------------------

enum rt_type { RT_U8 = 0, RT_S8 = 1, RT_U16 = 2, RT_S16 = 3, RT_S32 = 4, RT_F32 = 5 };

size_t rt_type_size(int type) {
    switch (type) {
        case RT_U8: case RT_S8: return 1;
        case RT_U16: case RT_S16: return 2;
        default: return 4;
    }
}

// Returns bytes written to out.
size_t rt_convert_iq(const int16_t *iq, size_t samples, void *out, int type,
                     int complex_out) {
    const size_t n = complex_out ? samples * 2 : samples;
    const size_t step = complex_out ? 1 : 2;
    switch (type) {
        case RT_U8: {
            uint8_t *o = (uint8_t *)out;
            for (size_t i = 0, j = 0; i < n; i++, j += step)
                o[i] = (uint8_t)(((int32_t)iq[j] + 32768) >> 8);
            return n;
        }
        case RT_S8: {
            int8_t *o = (int8_t *)out;
            for (size_t i = 0, j = 0; i < n; i++, j += step)
                o[i] = (int8_t)(iq[j] >> 8);
            return n;
        }
        case RT_U16: {
            uint16_t *o = (uint16_t *)out;
            for (size_t i = 0, j = 0; i < n; i++, j += step)
                o[i] = (uint16_t)((int32_t)iq[j] + 32768);
            return n * 2;
        }
        case RT_S16: {
            int16_t *o = (int16_t *)out;
            if (complex_out) memcpy(o, iq, n * 2);
            else
                for (size_t i = 0, j = 0; i < n; i++, j += step) o[i] = iq[j];
            return n * 2;
        }
        case RT_S32: {
            // low word replicated, matching the reference's bit-depth
            // extension (rf_file.c int32 writers: (s << 16) + s)
            int32_t *o = (int32_t *)out;
            for (size_t i = 0, j = 0; i < n; i++, j += step)
                o[i] = ((int32_t)iq[j] << 16) + iq[j];
            return n * 4;
        }
        case RT_F32: {
            // double multiply, single rounding to float — matches the
            // reference's (float)s * (1.0 / 32767.0) promotion
            float *o = (float *)out;
            for (size_t i = 0, j = 0; i < n; i++, j += step)
                o[i] = (float)((double)iq[j] * (1.0 / 32767.0));
            return n * 4;
        }
    }
    return 0;
}

// HackRF RF mode: interleaved IQ int16 -> int8, top 8 bits
// (rf_hackrf.c:246-276).
void rt_convert_hackrf_iq8(const int16_t *iq, size_t samples, int8_t *out) {
    for (size_t i = 0; i < samples * 2; i++) out[i] = (int8_t)(iq[i] >> 8);
}

// HackDAC baseband mode: real int16 sample -> 10-bit DAC code split over two
// bytes with a sync flag in the top bit (rf_hackrf.c:278-308). `samples`
// counts IQ pairs; only the I channel is sent.
void rt_convert_hackdac_bb(const int16_t *iq, size_t samples, uint8_t *out,
                           int16_t sync_level) {
    for (size_t i = 0; i < samples; i++) {
        int16_t s = iq[i * 2];
        int sync = s > sync_level;
        out[i * 2 + 0] = (uint8_t)((s >> 1) & 0xFF);
        out[i * 2 + 1] = (uint8_t)(((s >> 9) & 0x7F) | (sync << 7));
    }
}

// FL2K video channel: one IQ channel -> unsigned 8-bit DAC codes
// (rf_fl2k.c:96-133). channel 0 = I, 1 = Q.
void rt_convert_fl2k_u8(const int16_t *iq, size_t samples, uint8_t *out,
                        int channel) {
    for (size_t i = 0; i < samples; i++)
        out[i] = (uint8_t)((((int32_t)iq[i * 2 + channel]) + 32768) >> 8);
}

// FL2K audio delta-sigma dither: 16-bit PCM -> 8-bit DAC with first-order
// error feedback of the lost low 9 bits (rf_fl2k.c:157-183). `err` is the
// persistent accumulator for this channel (one int32 per channel).
void rt_fl2k_dither_u8(const int16_t *pcm, size_t n, size_t stride,
                       uint8_t *out, int32_t *err) {
    int32_t e = *err;
    for (size_t i = 0; i < n; i++) {
        uint16_t a = (uint16_t)((int32_t)pcm[i * stride] + 32768);
        uint8_t v = (uint8_t)((a & 0xFE00) >> 8);
        e += a & 0x1FF;
        if (e >= 0x1FF) {
            v++;
            e -= 0x1FF;
        }
        out[i] = v;
    }
    *err = e;
}

// ---------------------------------------------------------------------------
// Exact emulation of the reference's per-sample FM audio-carrier
// recurrence (src/video.c:2218-2276): the int32 complex phase is
// multiplied by a per-sample-value quantised LUT phasor with >>31
// truncation and renormalised by atan2 every 32767 samples.  The
// truncation walk means the carrier's int16 output has a data-dependent
// sub-LSB mean that FM-video modes integrate into a phase ramp — it
// must be reproduced exactly, so this serial kernel runs on the host.
// out_iq packs (i & 0xFFFF) | (q << 16) per sample.
void rt_fm_carrier_exact(int64_t *state,          // [3]: pi, pq, counter
                         const int16_t *samples, size_t n,
                         const int32_t *lut,      // [65536][2]
                         int32_t level, int32_t *out_iq) {
    int64_t pi = state[0], pq = state[1];
    long counter = (long)state[2];
    for (size_t t = 0; t < n; t++) {
        const int32_t *e = &lut[((int32_t)samples[t] + 32768) * 2];
        int64_t ni = (pi * e[0] - pq * e[1]) >> 31;
        int64_t nq = (pi * e[1] + pq * e[0]) >> 31;
        pi = ni;
        pq = nq;
        if (out_iq) {
            int32_t oi = (int32_t)(((pi >> 16) * level) >> 15);
            int32_t oq = (int32_t)(((pq >> 16) * level) >> 15);
            out_iq[t] = (oi & 0xFFFF) | ((uint32_t)oq << 16);
        }
        if (--counter == 0) {
            double ra = atan2((double)pq, (double)pi);
            pi = (int64_t)llround(cos(ra) * 2147483647.0);
            pq = (int64_t)llround(sin(ra) * 2147483647.0);
            counter = 32767;
        }
    }
    state[0] = pi;
    state[1] = pq;
    state[2] = counter;
}

// ---------------------------------------------------------------------------
// The reference's order-1 IIR (src/fir.c:722-734) with the exact double
// operation order: iy = in*b0 + ix*b1 - iy*a1.  scipy's lfilter computes
// the algebraically-equal direct-form-II-transposed order, whose +-1 ULP
// differences flip the subsequent lround at .5-adjacent values.
void rt_iir1_exact(const double *in, size_t n, double b0, double b1,
                   double a1, double *state, int16_t *out) {
    double ix = state[0], iy = state[1];
    for (size_t i = 0; i < n; i++) {
        iy = in[i] * b0 + ix * b1 - iy * a1;
        ix = in[i];
        double v = iy < -32768.0 ? -32768.0 : (iy > 32767.0 ? 32767.0
                                                            : iy);
        out[i] = (int16_t)llround(v);
    }
    state[0] = ix;
    state[1] = iy;
}

// ---------------------------------------------------------------------------
// Per-line Q15 FIR with zero edges (the reference's fir_int16 block
// semantics over each chroma line), int32 accumulate >>15, threaded
// over independent rows.
void rt_fir_block_i16(const int16_t *lines, long n_rows, long W,
                      const int32_t *taps, long nt, int16_t *out,
                      int nthreads) {
    long pad = nt / 2;
    auto work = [&](long r0, long r1) {
        for (long r = r0; r < r1; r++) {
            const int16_t *x = lines + r * W;
            int16_t *o = out + r * W;
            for (long i = 0; i < W; i++) {
                int32_t acc = 0;
                long lo = i - pad, hi = i + pad;
                if (lo < 0) lo = 0;
                if (hi >= W) hi = W - 1;
                for (long k = lo; k <= hi; k++)
                    acc += (int32_t)x[k] * taps[i + pad - k];
                acc >>= 15;
                o[i] = (int16_t)(acc < -32768 ? -32768
                                              : (acc > 32767 ? 32767
                                                             : acc));
            }
        }
    };
    if (nthreads <= 1 || n_rows < 16) {
        work(0, n_rows);
        return;
    }
    std::vector<std::thread> ts;
    long per = (n_rows + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
        long r0 = t * per, r1 = r0 + per > n_rows ? n_rows : r0 + per;
        if (r0 >= r1) break;
        ts.emplace_back(work, r0, r1);
    }
    for (auto &th : ts) th.join();
}

// int16-input variant of rt_iir1_exact (saves the f64 conversion pass)
void rt_iir1_exact_i16(const int16_t *in, size_t n, double b0, double b1,
                       double a1, double *state, int16_t *out) {
    double ix = state[0], iy = state[1];
    for (size_t i = 0; i < n; i++) {
        double x = (double)in[i];
        iy = x * b0 + ix * b1 - iy * a1;
        ix = x;
        double v = iy < -32768.0 ? -32768.0 : (iy > 32767.0 ? 32767.0
                                                            : iy);
        out[i] = (int16_t)llround(v);
    }
    state[0] = ix;
    state[1] = iy;
}

// ---------------------------------------------------------------------------
// Exact emulation of the reference's SECAM chroma carrier
// (src/video.c:3196-3233 + _fm_modulator_cgain :2278-2297): per line the
// int32 phase resets to +/-INT32_MAX and steps through the quantised
// per-chroma-value LUT with >>31 truncation; the output chain is
// ((((p>>16)*level)>>15)*g)>>15 per component, then the burst-window
// >>15.  Lines are independent (per-line reset), the per-line loop is
// serial.  chroma: clamped int16 [B*W]; sr: per-line span end; sign:
// per-line +1/-1 initial phase; out: int16 add-in [B*W] (zeroed here).
void rt_secam_carrier_exact(const int16_t *chroma, long B, long W,
                            long sl, const int32_t *sr,
                            const int8_t *sign,
                            const int32_t *lut,     // [65536][2]
                            const int16_t *bell,    // [65536][2]
                            int32_t level,
                            const int16_t *win,     // [>= W - sl]
                            int16_t *out, int nthreads) {
    memset(out, 0, sizeof(int16_t) * (size_t)(B * W));
    auto work = [&](long j0, long j1) {
        for (long j = j0; j < j1; j++) {
            long r = sr[j];
            if (r <= sl) continue;
            // the reference's span can overshoot the line width by a
            // couple of samples (sl + burst_width > width); those
            // writes land past l->width in its oversized buffer and
            // are never output
            if (r > W) r = W;
            int64_t pi = sign[j] >= 0 ? 2147483647LL : -2147483647LL;
            int64_t pq = 0;
            const int16_t *c = chroma + j * W;
            int16_t *o = out + j * W;
            for (long x = sl; x < r; x++) {
                const int32_t *e = &lut[((int32_t)c[x] + 32768) * 2];
                int64_t ni = (pi * e[0] - pq * e[1]) >> 31;
                int64_t nq = (pi * e[1] + pq * e[0]) >> 31;
                pi = ni;
                pq = nq;
                const int16_t *g = &bell[((int32_t)c[x] + 32768) * 2];
                int32_t vi = (int32_t)(((pi >> 16) * level) >> 15);
                int32_t vq = (int32_t)(((pq >> 16) * level) >> 15);
                int32_t m = ((vi * g[0]) >> 15) - ((vq * g[1]) >> 15);
                o[x] = (int16_t)((m * (int32_t)win[x - sl]) >> 15);
            }
        }
    };
    if (nthreads <= 1 || B < 16) {
        work(0, B);
        return;
    }
    std::vector<std::thread> ts;
    long per = (B + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
        long j0 = t * per, j1 = j0 + per > B ? B : j0 + per;
        if (j0 >= j1) break;
        ts.emplace_back(work, j0, j1);
    }
    for (auto &th : ts) th.join();
}

// ---------------------------------------------------------------------------
// MAC packet-mux bit kernels (reference: src/mac.c:279-336, 567-638).
// The mux queue simulation stays in Python (it is branchy and cheap) but
// the per-packet bit work — the 61-step PRBS1 keystream generator, the
// PRBS3 payload scrambler and the BCH + interleave packet encoder — is
// pure integer crunching that dominated the D-MAC host profile.

static inline int32_t rt_wrap16(int64_t a) {
    return (int32_t)(((a + 32768) & 0xFFFF) - 32768);
}

static inline uint32_t rt_rev32(uint32_t v, int bits) {
    v = ((v >> 1) & 0x55555555u) | ((v & 0x55555555u) << 1);
    v = ((v >> 2) & 0x33333333u) | ((v & 0x33333333u) << 2);
    v = ((v >> 4) & 0x0F0F0F0Fu) | ((v & 0x0F0F0F0Fu) << 4);
    v = ((v >> 8) & 0x00FF00FFu) | ((v & 0x00FF00FFu) << 8);
    v = (v >> 16) | (v << 16);
    return v >> (32 - bits);
}

static inline uint64_t rt_rev64(uint64_t v, int bits) {
    v = ((v >> 1) & 0x5555555555555555ull) |
        ((v & 0x5555555555555555ull) << 1);
    v = ((v >> 2) & 0x3333333333333333ull) |
        ((v & 0x3333333333333333ull) << 2);
    v = ((v >> 4) & 0x0F0F0F0F0F0F0F0Full) |
        ((v & 0x0F0F0F0F0F0F0F0Full) << 4);
    v = ((v >> 8) & 0x00FF00FF00FF00FFull) |
        ((v & 0x00FF00FF00FF00FFull) << 8);
    v = ((v >> 16) & 0x0000FFFF0000FFFFull) |
        ((v & 0x0000FFFF0000FFFFull) << 16);
    v = (v >> 32) | (v << 32);
    return v >> (64 - bits);
}

// Generate n 61-bit PRBS1 codes (src/mac.c:310-336), advancing the
// LFSR pair state[0]=sr1 (31 bit), state[1]=sr2 (29 bit) in place.
void rt_mac_prbs1(uint64_t *state, long n, uint64_t *codes) {
    // registers kept in the BIT-REVERSED domain: the generator reads
    // rev(sr) every step, and a right-shift LFSR step is a left-shift
    // step on the reversed register with a reversed polynomial
    uint32_t r1 = rt_rev32((uint32_t)state[0], 31);
    uint32_t r2 = rt_rev32((uint32_t)state[1], 29);
    const uint32_t Q1 = rt_rev32(0x78810820u, 31);
    const uint32_t Q2 = rt_rev32(0x17121100u, 29);
    for (long k = 0; k < n; k++) {
        uint64_t code = 0;
        for (int i = 0; i < 61; i++) {
            uint32_t a = (r2 & 3u) | ((r1 << 2) & 0x1Cu);
            uint32_t b = ((r2 >> 2) & 0xFFu) | ((r1 << 5) & 0xFFFFFF00u);
            code |= (uint64_t)((b >> a) & 1u) << i;
            r1 = ((r1 << 1) & 0x7FFFFFFFu) ^ (-((r1 >> 30) & 1u) & Q1);
            r2 = ((r2 << 1) & 0x1FFFFFFFu) ^ (-((r2 >> 28) & 1u) & Q2);
        }
        codes[k] = code;
    }
    state[0] = rt_rev32(r1, 31);
    state[1] = rt_rev32(r2, 29);
}

// Generate n 16-bit PRBS2 vision-scrambling codes (src/mac.c:287-293,
// 339-361), advancing state[0]=sr3 (31 bit), state[1]=sr4 (29 bit).
void rt_mac_prbs2(uint64_t *state, long n, uint16_t *codes) {
    // reversed-domain registers (see rt_mac_prbs1)
    uint32_t r3 = rt_rev32((uint32_t)state[0], 31);
    uint32_t r4 = rt_rev32((uint32_t)state[1], 29);
    const uint32_t Q3 = rt_rev32(0x7BB88888u, 31);
    const uint32_t Q4 = rt_rev32(0x17A2C100u, 29);
    for (long k = 0; k < n; k++) {
        uint32_t code = 0;
        for (int i = 0; i < 16; i++) {
            uint32_t a = r4 & 0x1Fu;
            if (a == 31) a = 30;
            code = (code >> 1) | (((r3 >> a) & 1u) << 15);
            r3 = ((r3 << 1) & 0x7FFFFFFFu) ^ (-((r3 >> 30) & 1u) & Q3);
            r4 = ((r4 << 1) & 0x1FFFFFFFu) ^ (-((r4 >> 28) & 1u) & Q4);
        }
        codes[k] = (uint16_t)code;
    }
    state[0] = rt_rev32(r3, 31);
    state[1] = rt_rev32(r4, 29);
}

// One Syster PRBS event (src/syster.c:706-724 + 305-327): clock the
// dual LFSR 16 steps, derive (s, r), and expand Kuhn's permutation
// into order[287].  st = {sr1, sr2, s_out, r_out}.
void rt_ng_event(uint64_t *st, const uint8_t *table, int32_t *order) {
    uint32_t sr1 = (uint32_t)st[0], sr2 = (uint32_t)st[1];
    uint32_t code = 0;
    for (int i = 0; i < 16; i++) {
        sr1 = (sr1 >> 1) ^ ((sr1 & 1u) ? 0x7BB88888u : 0u);
        sr2 = (sr2 >> 1) ^ ((sr2 & 1u) ? 0x17A2C100u : 0u);
        uint32_t a = (sr2 >> 24) & 0x1Fu;
        if (a == 31) a = 30;
        code = ((code << 1) | ((sr1 >> a) & 1u)) & 0xFFFFu;
    }
    st[0] = sr1;
    st[1] = sr2;
    uint32_t x = code >> 1;
    int s = (int)(x & 0x7Fu), r = (int)(x >> 7);
    st[2] = (uint64_t)s;
    st[3] = (uint64_t)r;
    int b[32];
    for (int j = 0; j < 32; j++) b[j] = j - 32;
    int s2 = 2 * s + 1;
    for (int i = 0; i < 287; i++) {
        int j = i <= 254 ? (int)table[(r + s2 * i) & 0xFF] : i - 255;
        order[b[j] + 32] = i;
        b[j] = i;
    }
}

// Generate n Videocrypt cut bytes (src/videocrypt.c:456-472): emit the
// current (c >> 8) byte, then clock the dual-LFSR multiplexer generator
// 16 steps (shift first, then extract — unlike the MAC PRBS2 order).
// state = {sr1 (31 bit), sr2 (29 bit), c (16 bit)}.
void rt_vc_clock16(uint64_t *state, long n, uint8_t *out) {
    uint32_t sr1 = (uint32_t)state[0], sr2 = (uint32_t)state[1];
    uint32_t c = (uint32_t)state[2];
    for (long k = 0; k < n; k++) {
        out[k] = (uint8_t)((c >> 8) & 0xFFu);
        for (int i = 0; i < 16; i++) {
            sr1 = (sr1 >> 1) ^ ((sr1 & 1u) ? 0x7BB88888u : 0u);
            sr2 = (sr2 >> 1) ^ ((sr2 & 1u) ? 0x17A2C100u : 0u);
            uint32_t a = rt_rev32(sr2, 29) & 0x1Fu;
            if (a == 31) a = 30;
            c = ((c >> 1) | (((rt_rev32(sr1, 31) >> a) & 1u) << 15))
                & 0xFFFFu;
        }
    }
    state[0] = sr1;
    state[1] = sr2;
    state[2] = c;
}

// 751-bit interleaved MAC packet (src/mac.c:567-638): BCH(23,12) header
// from address+continuity, optional 91-byte payload (728 bits LSB-first),
// optional PRBS3 scramble of payload bytes 1..90 keyed by the 61-bit iw,
// then the j*94+d -> 8*d+j bit interleave.  out is uint8[751].
void rt_mac_encode_packet(int address, int continuity,
                          const uint8_t *payload, int scramble,
                          uint64_t iw, uint8_t *out) {
    uint8_t bits[752];
    memset(bits, 0, sizeof(bits));
    // header: 10 addr bits + 2 continuity bits, LSB first
    uint32_t hdr = ((uint32_t)address & 0x3FFu) |
                   (((uint32_t)continuity & 3u) << 10);
    uint32_t code = 0;
    for (int i = 0; i < 12; i++) {
        uint32_t b = ((hdr >> i) ^ code) & 1u;
        code >>= 1;
        if (b) code ^= 0x0571u;
        bits[i] = (hdr >> i) & 1u;
    }
    for (int i = 0; i < 11; i++) bits[12 + i] = (code >> i) & 1u;
    if (payload) {
        for (int x = 0; x < 91; x++) {
            uint8_t byte = payload[x];
            if (scramble && x >= 1) {
                uint8_t c = 0;
                for (int s = 0; s < 8; s++) {
                    uint64_t r = rt_rev64(iw, 61);
                    uint32_t a = (uint32_t)(((r >> 4) & 1) |
                                            (((r >> 9) & 1) << 1) |
                                            (((r >> 14) & 1) << 2) |
                                            (((r >> 19) & 1) << 3) |
                                            (((r >> 24) & 1) << 4));
                    uint32_t b = (uint32_t)((r >> 29) & 0xFFFFFFFFull);
                    c = (uint8_t)((c >> 1) | (((b >> a) & 1u) << 7));
                    iw = (iw >> 1) ^ ((iw & 1) ? 0x163D23594C934051ull
                                               : 0ull);
                }
                byte ^= c;
            }
            for (int i = 0; i < 8; i++)
                bits[23 + x * 8 + i] = (byte >> i) & 1u;
        }
    }
    for (int d = 0; d < 94; d++)
        for (int j = 0; j < 8; j++) {
            int o = 8 * d + j;
            if (o < 751) out[o] = bits[j * 94 + d];
        }
}

// Batch variant: n packets in one call (the per-call ctypes overhead
// dominated the D-MAC mux at ~650 packets/block).  payloads is
// uint8[n][91] with has_payload[i] selecting a NULL payload.
void rt_mac_encode_packets(long n, const int32_t *addr,
                           const int32_t *cont,
                           const uint8_t *payloads,
                           const uint8_t *has_payload,
                           const uint8_t *scr, const uint64_t *iw,
                           uint8_t *out, int nthreads) {
    auto work = [&](long i0, long i1) {
        for (long i = i0; i < i1; i++)
            rt_mac_encode_packet(
                addr[i], cont[i],
                has_payload[i] ? payloads + i * 91 : nullptr,
                scr[i], iw[i], out + i * 751);
    };
    if (nthreads <= 1 || n < 64) {
        work(0, n);
        return;
    }
    std::vector<std::thread> ts;
    long per = (n + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
        long i0 = t * per, i1 = i0 + per > n ? n : i0 + per;
        if (i0 >= i1) break;
        ts.emplace_back(work, i0, i1);
    }
    for (auto &th : ts) th.join();
}

// ---------------------------------------------------------------------------
// Threaded file sink: converts int16 IQ blocks into the requested byte
// format, queues them on an rt_fifo, and drains the FIFO to a FILE* from a
// writer thread so disk IO overlaps with device compute.
// ---------------------------------------------------------------------------

struct rt_file_sink {
    FILE *f = nullptr;
    bool own_file = false;
    int type = RT_S16;
    int complex_out = 1;
    rt_fifo *fifo = nullptr;
    std::thread writer;
    std::vector<uint8_t> conv;
    std::atomic<long> io_error{0};
};

static void _file_writer_main(rt_file_sink *s) {
    std::vector<uint8_t> chunk(1 << 20);
    for (;;) {
        long r = rt_fifo_read(s->fifo, chunk.data(), chunk.size());
        if (r <= 0) break;
        if (fwrite(chunk.data(), 1, (size_t)r, s->f) != (size_t)r) {
            s->io_error.store(1);
            rt_fifo_abort(s->fifo);
            break;
        }
    }
    fflush(s->f);
}

rt_file_sink *rt_file_sink_open(const char *path, int type, int complex_out,
                                size_t fifo_bytes) {
    rt_file_sink *s = new (std::nothrow) rt_file_sink;
    if (!s) return nullptr;
    if (path && strcmp(path, "-") != 0) {
        s->f = fopen(path, "wb");
        s->own_file = true;
        if (!s->f) {
            delete s;
            return nullptr;
        }
    } else {
        s->f = stdout;
    }
    s->type = type;
    s->complex_out = complex_out;
    if (fifo_bytes < (1u << 16)) fifo_bytes = 1u << 16;
    s->fifo = rt_fifo_create(fifo_bytes, 0);
    s->writer = std::thread(_file_writer_main, s);
    return s;
}

// Enqueue `samples` IQ pairs; returns 0 on success, -1 on IO error.
long rt_file_sink_write(rt_file_sink *s, const int16_t *iq, size_t samples) {
    size_t need = (s->complex_out ? 2 : 1) * samples * rt_type_size(s->type);
    if (s->conv.size() < need) s->conv.resize(need);
    size_t nb = rt_convert_iq(iq, samples, s->conv.data(), s->type, s->complex_out);
    if (rt_fifo_write(s->fifo, s->conv.data(), nb) < 0) return -1;
    return s->io_error.load() ? -1 : 0;
}

long rt_file_sink_close(rt_file_sink *s) {
    rt_fifo_close_writer(s->fifo);
    if (s->writer.joinable()) s->writer.join();
    long err = s->io_error.load();
    if (s->own_file) fclose(s->f);
    rt_fifo_destroy(s->fifo);
    delete s;
    return err ? -1 : 0;
}

// ---------------------------------------------------------------------------
// MAC packetised-audio coding blocks (host bit domain).  Mirrors
// hacktv_tpu/audio/mac_audio.py _encode_blocks / the reference's
// mac_audioenc_read loop (src/mac.c:1200-1354): streaming J.17 FIR in
// Q15 with int64 accumulate, near-instantaneous companding with scale
// factors, L1 parity / L2 Hamming protection, in-band scale-factor
// signalling, LSB-first bit packing.
// ---------------------------------------------------------------------------

static inline uint8_t rt_l2_hamming(uint32_t b) {
    // parity groups over bits of the 11-bit value (src/mac.c:1187-1198)
    auto g = [&](std::initializer_list<int> ks) {
        uint32_t p = 0;
        for (int k : ks) p ^= (b >> k) & 1u;
        return p;
    };
    uint32_t p = g({0, 3, 4, 6, 7, 8, 10});
    p |= g({0, 1, 3, 5, 6, 8, 9}) << 1;
    p |= g({0, 1, 2, 4, 6, 7, 9}) << 2;
    p |= g({1, 2, 4, 5, 6, 8, 10}) << 3;
    p |= g({2, 3, 5, 6, 7, 9, 10}) << 4;
    return (uint8_t)p;
}

// Dot product of the reversed-tap vector with a forward input window.
// Forward unit-stride indexing on both operands lets the compiler
// vectorize; target_clones picks the widest ISA at load time while the
// binary stays portable.
#if defined(__x86_64__) && defined(__has_attribute)
#if __has_attribute(target_clones)
__attribute__((target_clones("avx512f", "avx2", "default")))
#endif
#endif
__attribute__((optimize("-fassociative-math", "-fno-signed-zeros",
                        "-fno-trapping-math")))
static int64_t rt_fir_dot(const double *rtaps, const double *w,
                          int ntaps) {
    // int16-range samples x int32 taps: products <= 2^46 and a 65-tap
    // sum < 2^53, so double accumulation is EXACT and vectorizes to
    // wide FMA where int64 multiply-accumulate does not
    double acc = 0;
    for (int j = 0; j < ntaps; j++)
        acc += rtaps[j] * w[j];
    return (int64_t)acc;
}

// Streaming FIR state is kept by the caller: hist holds the last
// ntaps-1 inputs, phase the decimation phase.  Returns decimated y.
static void rt_j17_fir(const int32_t *taps, int ntaps, int dec,
                       int32_t *hist, int32_t *phase,
                       const int32_t *x, long n, int32_t *y, long *ny) {
    long m = 0;
    int ph = *phase;
    // work buffer: history + input, widened once to double
    std::vector<double> buf((size_t)(ntaps - 1 + n));
    for (int j = 0; j < ntaps - 1; j++) buf[j] = hist[j];
    for (long t = 0; t < n; t++) buf[ntaps - 1 + t] = x[t];
    // taps[j] pairs with w[ntaps-1-j]; reversing the taps makes both
    // sides of the product walk forward
    std::vector<double> rtaps((size_t)ntaps);
    for (int j = 0; j < ntaps; j++) rtaps[j] = taps[ntaps - 1 - j];
    for (long t = 0; t < n; t++) {
        bool keep = dec <= 1 || ((t + ph) % dec) == 0;
        if (keep) {
            int64_t acc = rt_fir_dot(rtaps.data(), buf.data() + t,
                                     ntaps) >> 15;
            if (acc > 32767) acc = 32767;
            if (acc < -32768) acc = -32768;
            y[m++] = (int32_t)acc;
        }
    }
    *phase = (int)((ph + n) % (dec > 1 ? dec : 1));
    for (int j = 0; j < ntaps - 1; j++)
        hist[j] = (int32_t)buf[n + j];
    *ny = m;
}

// scale factor table: idx -> (factor, shift) (src/mac.c:135-151)
static const int rt_sf_factor[8] = {0, 1, 2, 4, 3, 5, 6, 7};
static const int rt_sf_shift[8]  = {2, 2, 2, 2, 3, 4, 5, 6};

// Encode nblk sound coding blocks.  S is [nblk*sspb] source samples in
// stream order (stereo interleaved, or mono with sequential halves).
// hist0/hist1 + phase0/phase1 are the per-channel streaming FIR states
// (mono uses channel 0 only).  out receives nblk*block_len bytes.
void rt_mac_audio_blocks(const int32_t *S, long nblk, long sspb,
                         int stereo, int linear, int protection,
                         const int32_t *taps, int ntaps, int dec,
                         int32_t *hist0, int32_t *phase0,
                         int32_t *hist1, int32_t *phase1,
                         uint8_t *out) {
    const long spb = linear && protection ? 36 : 64;
    const long ch_len = spb / 2;
    const int bps = (linear ? 14 : 10) + (protection ? 5 : 1);
    const long block_len = (linear ^ protection) ? 120 : 90;
    const int step = stereo ? 2 : 1;
    const long ch_off[2] = {0, stereo ? 1 : ch_len};
    const long sfl = linear && protection ? 18 : 27;
    const long ch_sf_off[2] = {0, stereo ? 1 : sfl};

    // channel streams through the FIRs
    long n_in = nblk * sspb;
    std::vector<int32_t> ch(n_in), yc[2];
    long nyc[2] = {0, 0};
    if (stereo) {
        long half = n_in / 2;
        yc[0].resize(half); yc[1].resize(half);
        std::vector<int32_t> ch2(half);
        auto one = [&](int b, int32_t *tmp) {
            for (long i = 0; i < half; i++) tmp[i] = S[2 * i + b];
            rt_j17_fir(taps, ntaps, dec, b ? hist1 : hist0,
                       b ? phase1 : phase0, tmp, half,
                       yc[b].data(), &nyc[b]);
        };
        std::thread th(one, 1, ch2.data());
        one(0, ch.data());
        th.join();
    } else {
        yc[0].resize(n_in);
        rt_j17_fir(taps, ntaps, dec, hist0, phase0, S, n_in,
                   yc[0].data(), &nyc[0]);
    }

    auto blocks = [&](long k0_, long k1_) {
    std::vector<uint32_t> out_buf((size_t)spb);
    for (long k = k0_; k < k1_; k++) {
        uint32_t sfc = 0;
        int factors[2];
        for (int b = 0; b < 2; b++) {
            // mono: block row holds [ch0 half | ch1 half] sequentially
            const int32_t *ys = stereo
                ? yc[b].data() + k * ch_len
                : yc[0].data() + k * 2 * ch_len + b * ch_len;
            int32_t m = 0;
            for (long i = 0; i < ch_len; i++) {
                int32_t v = ys[i] < 0 ? ~ys[i] : ys[i];
                if (v > m) m = v;
            }
            int e = 0;
            while ((m >> e) != 0) e++;        // bit_length
            int idx = e - 8;
            if (idx < 1) idx = 1;
            if (idx > 7) idx = 7;
            int factor = rt_sf_factor[idx], shift = rt_sf_shift[idx];
            sfc = ((sfc << 9) | ((uint32_t)factor << 6) |
                   ((uint32_t)factor << 3) | (uint32_t)factor) & 0x3FFFFu;
            factors[b] = factor;
            for (long i = 0; i < ch_len; i++) {
                uint32_t enc = linear
                    ? (uint32_t)(ys[i] >> 2) & 0x3FFFu
                    : (uint32_t)(ys[i] >> shift) & 0x3FFu;
                if (protection) {
                    uint32_t h = rt_l2_hamming(
                        linear ? (enc >> 3) : ((enc << 1) & 0x7E0u));
                    enc |= h << (bps - 5);
                } else {
                    uint32_t v = enc >> (linear ? 3 : 4);
                    uint32_t pc = v;
                    pc ^= pc >> 16; pc ^= pc >> 8; pc ^= pc >> 4;
                    pc ^= pc >> 2; pc ^= pc >> 1;
                    enc |= (pc & 1u) << (bps - 1);
                }
                out_buf[ch_off[b] + step * i] = enc;
            }
        }
        // scale-factor signalling XOR on the protection bit
        for (int b = 0; b < 2; b++)
            for (long i = 0; i < sfl; i++) {
                uint32_t sfb = ((uint32_t)factors[b] >> (2 - i % 3)) & 1u;
                out_buf[ch_sf_off[b] + step * i] ^= sfb << (bps - 1);
            }
        // bit assembly, LSB-first within the block: append each
        // sample's bps bits with shifted byte ORs (the bit-per-byte
        // temp cost ~3 passes over 720 bits per block)
        uint8_t tmp[256 + 8];
        memset(tmp, 0, (size_t)block_len + 8);
        long bitpos = 0;
        if (!linear && !protection) bitpos = 16;     // zero prefix
        if (linear && protection) {
            bitpos = 18;
            for (int i = 0; i < 18; i++) {
                if ((sfc >> (17 - i)) & 1u)
                    tmp[bitpos >> 3] |=
                        (uint8_t)(1u << (bitpos & 7));
                bitpos++;
            }
        }
        for (long i = 0; i < spb; i++) {
            uint64_t w = (uint64_t)out_buf[i] << (bitpos & 7);
            uint8_t *p = tmp + (bitpos >> 3);
            p[0] |= (uint8_t)w;
            p[1] |= (uint8_t)(w >> 8);
            p[2] |= (uint8_t)(w >> 16);
            p[3] |= (uint8_t)(w >> 24);
            bitpos += bps;
        }
        memcpy(out + k * block_len, tmp, block_len);
    }
    };
    if (nblk < 64) {
        blocks(0, nblk);
    } else {
        const int nt = 4;
        std::vector<std::thread> ts;
        long per = (nblk + nt - 1) / nt;
        for (int t = 0; t < nt; t++) {
            long k0_ = t * per, k1_ = k0_ + per > nblk ? nblk : k0_ + per;
            if (k0_ >= k1_) break;
            ts.emplace_back(blocks, k0_, k1_);
        }
        for (auto &th : ts) th.join();
    }
}

// ---------------------------------------------------------------------------
// MAC line materialisation: XOR the consumed packet-stream bits into
// pre-packed per-line base rows (sync word + whitening, gathered by the
// caller from a [2][625] table) and popcount each row for the running
// duobinary polarity (hacktv_tpu/video/mac.py _materialize;
// src/mac.c:1375-1439).  The stream is a bit-per-byte array; segment
// bit offsets within the line are fixed per subframe.
// ---------------------------------------------------------------------------

void rt_mac_materialize(long n, long nbytes, long sbb,
                        const uint8_t *base,      // [n][sbb] prefix rows
                        const int64_t *offs,      // [2] segment bit offs
                        int nsub,
                        const uint8_t *stream0, const int64_t *pos0,
                        const int64_t *len0,
                        const uint8_t *stream1, const int64_t *pos1,
                        const int64_t *len1,
                        uint8_t *packed, int64_t *ones, int nthreads) {
    auto work = [&](long i0_, long i1_) {
        for (long i = i0_; i < i1_; i++) {
            uint8_t *ob = packed + i * nbytes;
            memcpy(ob, base + i * sbb, sbb);
            for (int c = 0; c < nsub; c++) {
                const uint8_t *st = c ? stream1 : stream0;
                long a = c ? pos1[i] : pos0[i];
                long ln = c ? len1[i] : len0[i];
                long off = offs[c];
                for (long j = 0; j < ln; j++)
                    ob[(off + j) >> 3] ^=
                        (uint8_t)(st[a + j] << ((off + j) & 7));
            }
            long cnt = 0;
            for (long j = 0; j < sbb; j++)
                cnt += __builtin_popcount(ob[j]);
            ones[i] = cnt;
        }
    };
    if (nthreads <= 1 || n < 2048) {
        work(0, n);
        return;
    }
    std::vector<std::thread> ts;
    long per = (n + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
        long i0_ = t * per, i1_ = i0_ + per > n ? n : i0_ + per;
        if (i0_ >= i1_) break;
        ts.emplace_back(work, i0_, i1_);
    }
    for (auto &th : ts) th.join();
}

// ---------------------------------------------------------------------------
// NICAM-728 frame encoder (hacktv_tpu/audio/nicam.py encode_frames;
// src/nicam728.c:140-239): J.17 pre-emphasis with int16 wraparound,
// near-instantaneous companding with in-band scale-factor signalling,
// bit interleave, MSB-first packing, PRN whitening.
// ---------------------------------------------------------------------------


void rt_nicam_encode_frames(const int32_t *pcm,   // [n*32+hist][2]
                            long n_frames,
                            const int32_t *taps, int ntaps,
                            const int32_t *shift_t,   // [8]
                            const int32_t *factor_t,  // [8]
                            const int16_t *ileave,    // [704]
                            const uint8_t *prn,       // [90]
                            long first_frame, int mode, int reserve,
                            uint8_t *out) {           // [n_frames][91]
    const long hist = ntaps - 1;
    const long nsamp = n_frames * 32;
    // J.17 per channel, wrapped to int16 at each store
    std::vector<int32_t> l(nsamp), r(nsamp);
    for (int ch = 0; ch < 2; ch++) {
        int32_t *y = ch ? r.data() : l.data();
        for (long i = 0; i < nsamp; i++) {
            long t = hist + i;
            int64_t acc = 0;
            const int32_t *x = pcm + (t - hist) * 2 + ch;
            for (int j = 0; j < ntaps; j++)
                acc += (int64_t)taps[j] * x[j * 2];
            y[i] = rt_wrap16(acc >> 15);
        }
    }
    std::vector<uint8_t> fb(728);
    for (long f = 0; f < n_frames; f++) {
        const int32_t *fl = l.data() + f * 32;
        const int32_t *fr = r.data() + f * 32;
        int b[2];
        for (int ch = 0; ch < 2; ch++) {
            const int32_t *ys = ch ? fr : fl;
            int32_t m = 0;
            for (int i = 0; i < 32; i++) {
                int32_t v = ys[i] < 0 ? ~ys[i] : ys[i];
                if (v > m) m = v;
            }
            int e = 0;
            while ((m >> e) != 0) e++;
            int idx = e - 8;
            if (idx < 1) idx = 1;
            if (idx > 7) idx = 7;
            b[ch] = idx;
        }
        memset(fb.data(), 0, 728);
        long fnum = first_frame + f;
        uint32_t c0 = (uint32_t)((~fnum) >> 3) & 1u;
        uint32_t hdr_b2 = (c0 << 7) | (((uint32_t)(mode >> 2) & 1u) << 6)
            | (((uint32_t)(mode >> 1) & 1u) << 5)
            | (((uint32_t)mode & 1u) << 4)
            | (((uint32_t)reserve & 1u) << 3);
        uint32_t header = (0x4Eu << 16) | (hdr_b2 << 8);
        for (int i = 0; i < 24; i++)
            fb[i] = (header >> (23 - i)) & 1u;
        for (int x = 0; x < 64; x++) {
            int ch = x & 1;
            int32_t samp = ch ? fr[x >> 1] : fl[x >> 1];
            int shift = shift_t[b[ch]], factor = factor_t[b[ch]];
            uint32_t v = (uint32_t)(samp >> shift) & 0x3FFu;
            uint32_t p6 = (v >> 4) & 0x3Fu;
            p6 ^= p6 >> 4; p6 ^= p6 >> 2; p6 ^= p6 >> 1;
            v |= (p6 & 1u) << 10;
            if (x < 54) {
                uint32_t sig =
                    ((uint32_t)factor >> (2 - ((x >> 1) % 3))) & 1u;
                v ^= sig << 10;
            }
            for (int bit = 0; bit < 11; bit++)
                fb[24 + ileave[x * 11 + bit]] = (v >> bit) & 1u;
        }
        uint8_t *ob = out + f * 91;
        memset(ob, 0, 91);
        for (int i = 0; i < 728; i++)
            if (fb[i]) ob[i >> 3] |= (uint8_t)(0x80u >> (i & 7));
        for (int i = 0; i < 90; i++) ob[1 + i] ^= prn[i];
    }
}

// ---------------------------------------------------------------------------
// MAC mux window replay: runs the packet-queue simulation for one
// window's read schedule (hacktv_tpu/video/mac.py ensure phase B;
// src/mac.c:1016-1039) and encodes every 751-bit packet directly into
// the per-subframe stream bit buffers (bit per byte, read i at
// out_c + i*751).  Pushes are grouped per slot: slot 0 is applied
// before any event (the surviving queue of the previous window), slot
// e+1 after event e's drains.  Queue capacity 12; full queues drop the
// push, empty queues read dummies (addr 0x3FF, continuity cycle).
// Returns the surviving queue as push indices.
// ---------------------------------------------------------------------------

void rt_mac_mux_replay(long n_events,
                       const int64_t *his0,    // [n_events+1] boundaries
                       const int64_t *his1,    // (last = total reads)
                       const int32_t *push_off,  // [n_events+2]
                       const uint8_t *push_q,
                       const int32_t *push_addr,
                       const int32_t *push_cont,
                       const uint8_t *push_pay,   // [n_push][91]
                       const uint8_t *push_has,
                       const uint8_t *push_scr,
                       const uint64_t *iw0,       // [n_reads0]
                       int32_t *dumc,             // [2] in/out
                       uint8_t *out0, uint8_t *out1,
                       int32_t *surv, int32_t *n_surv,  // [24], [2]
                       int nthreads) {
    const long cap = 12;
    long ri[2] = {0, 0};
    std::vector<int32_t> queue[2];     // push indices, FIFO
    // assignment per read: >= 0 push index, -1 dummy
    long total0 = his0[n_events], total1 = his1[n_events];
    std::vector<int32_t> asg[2];
    asg[0].assign((size_t)total0, -1);
    asg[1].assign((size_t)total1, -1);
    std::vector<int32_t> dcont[2];     // dummy continuity per dummy read
    dcont[0].assign((size_t)total0, 0);
    dcont[1].assign((size_t)total1, 0);

    auto drain = [&](int c, long hi) {
        auto &q = queue[c];
        auto &a = asg[c];
        auto &d = dcont[c];
        for (long i = ri[c]; i < hi; i++) {
            if (!q.empty()) {
                a[i] = q.front();
                q.erase(q.begin());
            } else {
                d[i] = dumc[c]++;
            }
        }
        if (hi > ri[c]) ri[c] = hi;
    };
    auto apply = [&](long g) {
        for (int32_t p = push_off[g]; p < push_off[g + 1]; p++) {
            int c = push_q[p];
            if ((long)queue[c].size() < cap) queue[c].push_back(p);
        }
    };
    apply(0);
    for (long e = 0; e < n_events; e++) {
        drain(0, his0[e]);
        drain(1, his1[e]);
        apply(e + 1);
    }
    drain(0, total0);
    drain(1, total1);
    n_surv[0] = (int32_t)queue[0].size();
    n_surv[1] = (int32_t)queue[1].size();
    for (int c = 0, k = 0; c < 2; c++)
        for (int32_t p : queue[c]) surv[k++] = p;

    // encode pass: dummy cycle cached (period 4), real packets threaded
    uint8_t dummy[4][751];
    for (int t = 0; t < 4; t++)
        rt_mac_encode_packet(0x3FF, t, nullptr, 0, 0, dummy[t]);
    auto encode = [&](int c, long i0_, long i1_) {
        uint8_t *out = c ? out1 : out0;
        auto &a = asg[c];
        auto &d = dcont[c];
        for (long i = i0_; i < i1_; i++) {
            uint8_t *ob = out + i * 751;
            int32_t p = a[i];
            if (p < 0) {
                memcpy(ob, dummy[d[i] & 3], 751);
            } else {
                rt_mac_encode_packet(
                    push_addr[p], push_cont[p],
                    push_has[p] ? push_pay + (size_t)p * 91 : nullptr,
                    push_scr[p], c == 0 ? iw0[i] : 0, ob);
            }
        }
    };
    if (nthreads <= 1) {
        encode(0, 0, total0);
        encode(1, 0, total1);
        return;
    }
    std::vector<std::thread> ts;
    for (int c = 0; c < 2; c++) {
        long total = c ? total1 : total0;
        int nt = nthreads / 2 > 0 ? nthreads / 2 : 1;
        long per = (total + nt - 1) / nt;
        for (int t = 0; t < nt; t++) {
            long i0_ = t * per, i1_ = i0_ + per > total ? total : i0_ + per;
            if (i0_ >= i1_) break;
            ts.emplace_back(encode, c, i0_, i1_);
        }
    }
    for (auto &th : ts) th.join();
}

// ---------------------------------------------------------------------------
// Packed MAC packet pipeline.  The bit-per-byte representation above costs
// ~8x the memory traffic and forces per-bit XOR loops downstream; these
// variants keep the packet streams PACKED (LSB-first bits) end to end:
// replay writes 94-byte packets head-to-tail at arbitrary bit offsets in a
// caller-owned stream buffer, and materialize extracts each line's
// data-burst slice with unaligned u64 loads + shifts (src/mac.c:1375-1439
// semantics, same bit-exact output as the unpacked path).
// ---------------------------------------------------------------------------

// PRBS3 whitening byte (src/mac.c:252-266).  Equivalent to the rev64
// formulation in rt_mac_encode_packet: with r = rev61(iw), the 5 address
// bits come from r bits 4,9,14,19,24 = iw bits 56,51,46,41,36 and the
// output bit is r bit (29+a) = iw bit (31-a) -- no reversal needed.
static uint8_t rt_prbs3_byte_scalar(uint64_t *iw_) {
    uint64_t iw = *iw_;
    uint8_t cb = 0;
    for (int s = 0; s < 8; s++) {
        uint32_t a = (uint32_t)(((iw >> 56) & 1) | (((iw >> 51) & 1) << 1) |
                                (((iw >> 46) & 1) << 2) |
                                (((iw >> 41) & 1) << 3) |
                                (((iw >> 36) & 1) << 4));
        cb = (uint8_t)((cb >> 1) | (((iw >> (31 - a)) & 1u) << 7));
        iw = (iw >> 1) ^ ((iw & 1) ? 0x163D23594C934051ull : 0ull);
    }
    *iw_ = iw;
    return cb;
}

#if defined(__x86_64__)
#include <immintrin.h>
// pext gathers the 5 address bits in ascending position order
// (36,41,46,51,56) while the generator wants them descending; a 32-entry
// reversal table fixes the order in one load.
static const uint8_t rt_rev5_tab[32] = {
    0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30,
    1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31};
__attribute__((target("bmi2")))
static uint8_t rt_prbs3_byte_bmi2(uint64_t *iw_) {
    const uint64_t M = (1ull << 36) | (1ull << 41) | (1ull << 46) |
                       (1ull << 51) | (1ull << 56);
    uint64_t iw = *iw_;
    uint8_t cb = 0;
    for (int s = 0; s < 8; s++) {
        uint32_t a = rt_rev5_tab[_pext_u64(iw, M)];
        cb = (uint8_t)((cb >> 1) | (((iw >> (31 - a)) & 1u) << 7));
        iw = (iw >> 1) ^ (-(iw & 1) & 0x163D23594C934051ull);
    }
    *iw_ = iw;
    return cb;
}
static uint8_t (*rt_prbs3_select())(uint64_t *) {
    return __builtin_cpu_supports("bmi2") ? rt_prbs3_byte_bmi2
                                          : rt_prbs3_byte_scalar;
}
static uint8_t (*const rt_prbs3_byte_ptr)(uint64_t *) = rt_prbs3_select();
#else
static uint8_t (*const rt_prbs3_byte_ptr)(uint64_t *) =
    rt_prbs3_byte_scalar;
#endif

static inline uint8_t rt_prbs3_byte(uint64_t *iw_) {
    return rt_prbs3_byte_ptr(iw_);
}

// The j*94+d -> 8*d+j interleave as an 8x94 bit-matrix transpose: output
// byte d collects bit d of each of the 8 serial 94-bit rows.
static void rt_interleave751(const uint8_t *ser, uint8_t *out) {
    uint64_t rlo[8], rhi[8];
    for (int j = 0; j < 8; j++) {
        long b0 = 94 * j;
        uint64_t w0, w1;
        memcpy(&w0, ser + (b0 >> 3), 8);
        memcpy(&w1, ser + (b0 >> 3) + 8, 8);
        int sh = (int)(b0 & 7);
        rlo[j] = sh ? (w0 >> sh) | (w1 << (64 - sh)) : w0;
        rhi[j] = sh ? (w1 >> sh) : w1;
    }
    for (int B = 0; B < 12; B++) {
        uint64_t x = 0;
        for (int j = 0; j < 8; j++) {
            uint8_t byte = B < 8 ? (uint8_t)(rlo[j] >> (8 * B))
                                 : (uint8_t)(rhi[j] >> (8 * (B - 8)));
            x |= (uint64_t)byte << (8 * j);
        }
        // 8x8 bit transpose: x byte j bit c -> byte c bit j
        uint64_t t;
        t = (x ^ (x >> 7)) & 0x00AA00AA00AA00AAull; x ^= t ^ (t << 7);
        t = (x ^ (x >> 14)) & 0x0000CCCC0000CCCCull; x ^= t ^ (t << 14);
        t = (x ^ (x >> 28)) & 0x00000000F0F0F0F0ull; x ^= t ^ (t << 28);
        int lim = (94 - 8 * B) < 8 ? (94 - 8 * B) : 8;
        for (int c = 0; c < lim; c++)
            out[8 * B + c] = (uint8_t)(x >> (8 * c));
    }
}

// Packed-output packet encoder: 751 interleaved bits in out[94], LSB
// first (bit 7 of out[93] is always 0).  Bit-identical to
// rt_mac_encode_packet followed by LSB-first packbits.
void rt_mac_encode_packet_packed(int address, int continuity,
                                 const uint8_t *payload, int scramble,
                                 uint64_t iw, uint8_t *out) {
    uint8_t ser[112];
    memset(ser, 0, sizeof(ser));
    uint32_t hdr = ((uint32_t)address & 0x3FFu) |
                   (((uint32_t)continuity & 3u) << 10);
    uint32_t code = 0;
    for (int i = 0; i < 12; i++) {
        uint32_t b = ((hdr >> i) ^ code) & 1u;
        code >>= 1;
        if (b) code ^= 0x0571u;
    }
    uint32_t h23 = (hdr & 0xFFFu) | (code << 12);
    ser[0] = (uint8_t)h23;
    ser[1] = (uint8_t)(h23 >> 8);
    ser[2] = (uint8_t)((h23 >> 16) & 0x7Fu);
    if (payload) {
        for (int x = 0; x < 91; x++) {
            uint8_t byte = payload[x];
            if (scramble && x >= 1) byte ^= rt_prbs3_byte(&iw);
            // serial bit 23 + 8x: byte (2+x) bit 7 onward
            ser[2 + x] |= (uint8_t)(byte << 7);
            ser[3 + x] |= (uint8_t)(byte >> 1);
        }
    }
    rt_interleave751(ser, out);
}

// OR a 94-byte packed packet into dst at an arbitrary bit offset.
// skip_first suppresses the write to the offset's first byte (shared
// with another writer); its contribution is returned for deferred OR.
static inline uint8_t rt_or_packet(uint8_t *dst, int64_t bitoff,
                                   const uint8_t *p, int skip_first) {
    long b0 = (long)(bitoff >> 3);
    int sh = (int)(bitoff & 7);
    if (sh == 0) {
        for (int i = 0; i < 94; i++) dst[b0 + i] |= p[i];
        return 0;
    }
    uint8_t first = (uint8_t)(p[0] << sh);
    if (!skip_first) dst[b0] |= first;
    for (int i = 1; i < 94; i++)
        dst[b0 + i] |= (uint8_t)((p[i] << sh) | (p[i - 1] >> (8 - sh)));
    // tail spill: when sh == 1 this is always 0 (packet bit 751 is 0)
    // and byte b0+94 belongs to the NEXT range's first sh==0 packet --
    // an unconditional |= 0 would still be a racy read-modify-write
    uint8_t tl = (uint8_t)(p[93] >> (8 - sh));
    if (tl) dst[b0 + 94] |= tl;
    return first;
}

// rt_mac_mux_replay with packed stream output: packet for read i of
// subframe c lands at bit (tail_c + i*751) of buf_c.  The buffers must
// be zeroed beyond the tail and sized for the new bits + 16 spare
// bytes.  Queue simulation identical to rt_mac_mux_replay.
void rt_mac_mux_replay_packed(long n_events,
                              const int64_t *his0, const int64_t *his1,
                              const int32_t *push_off,
                              const uint8_t *push_q,
                              const int32_t *push_addr,
                              const int32_t *push_cont,
                              const uint8_t *push_pay,
                              const uint8_t *push_has,
                              const uint8_t *push_scr,
                              const uint64_t *iw0,
                              int32_t *dumc,
                              uint8_t *buf0, int64_t tail0,
                              uint8_t *buf1, int64_t tail1,
                              int32_t *surv, int32_t *n_surv,
                              int nthreads) {
    const long cap = 12;
    long ri[2] = {0, 0};
    std::vector<int32_t> queue[2];
    long total0 = his0[n_events], total1 = his1[n_events];
    std::vector<int32_t> asg[2];
    asg[0].assign((size_t)total0, -1);
    asg[1].assign((size_t)total1, -1);
    std::vector<int32_t> dcont[2];
    dcont[0].assign((size_t)total0, 0);
    dcont[1].assign((size_t)total1, 0);

    auto drain = [&](int c, long hi) {
        auto &q = queue[c];
        auto &a = asg[c];
        auto &d = dcont[c];
        for (long i = ri[c]; i < hi; i++) {
            if (!q.empty()) {
                a[i] = q.front();
                q.erase(q.begin());
            } else {
                d[i] = dumc[c]++;
            }
        }
        if (hi > ri[c]) ri[c] = hi;
    };
    auto apply = [&](long g) {
        for (int32_t p = push_off[g]; p < push_off[g + 1]; p++) {
            int c = push_q[p];
            if ((long)queue[c].size() < cap) queue[c].push_back(p);
        }
    };
    apply(0);
    for (long e = 0; e < n_events; e++) {
        drain(0, his0[e]);
        drain(1, his1[e]);
        apply(e + 1);
    }
    drain(0, total0);
    drain(1, total1);
    n_surv[0] = (int32_t)queue[0].size();
    n_surv[1] = (int32_t)queue[1].size();
    for (int c = 0, k = 0; c < 2; c++)
        for (int32_t p : queue[c]) surv[k++] = p;

    uint8_t dummyp[4][94];
    for (int t = 0; t < 4; t++)
        rt_mac_encode_packet_packed(0x3FF, t, nullptr, 0, 0, dummyp[t]);

    // encode pass: each (thread, subframe) range defers its first-byte
    // OR (shared with the preceding writer) to a side slot
    struct Range { int c; long i0, i1; uint8_t side; };
    std::vector<Range> ranges;
    int nt = nthreads > 1 ? nthreads : 1;
    for (int c = 0; c < 2; c++) {
        long total = c ? total1 : total0;
        if (!total) continue;
        long per = (total + nt - 1) / nt;
        for (int t = 0; t < nt; t++) {
            long i0_ = t * per, i1_ = i0_ + per > total ? total : i0_ + per;
            if (i0_ >= i1_) break;
            ranges.push_back({c, i0_, i1_, 0});
        }
    }
    auto encode = [&](Range *r) {
        uint8_t *buf = r->c ? buf1 : buf0;
        int64_t tail = r->c ? tail1 : tail0;
        auto &a = asg[r->c];
        auto &d = dcont[r->c];
        for (long i = r->i0; i < r->i1; i++) {
            uint8_t p94[94];
            const uint8_t *src;
            int32_t p = a[i];
            if (p < 0) {
                src = dummyp[d[i] & 3];
            } else {
                rt_mac_encode_packet_packed(
                    push_addr[p], push_cont[p],
                    push_has[p] ? push_pay + (size_t)p * 91 : nullptr,
                    push_scr[p], r->c == 0 ? iw0[i] : 0, p94);
                src = p94;
            }
            uint8_t f = rt_or_packet(buf, tail + i * 751, src, i == r->i0);
            if (i == r->i0) r->side = f;
        }
    };
    if (nt <= 1 || ranges.size() <= 1) {
        for (auto &r : ranges) encode(&r);
    } else {
        std::vector<std::thread> ts;
        for (size_t k = 1; k < ranges.size(); k++)
            ts.emplace_back(encode, &ranges[k]);
        encode(&ranges[0]);
        for (auto &th : ts) th.join();
    }
    for (auto &r : ranges) {
        if (!r.side) continue;
        uint8_t *buf = r.c ? buf1 : buf0;
        int64_t off = (r.c ? tail1 : tail0) + r.i0 * 751;
        buf[off >> 3] |= r.side;
    }
}

// rt_mac_materialize over PACKED streams: line i's subframe-c slice is
// len_c[i] bits at absolute bit pos_c[i] of stream_c, XORed into the
// packed row at static bit offset offs[c].  Streams need 16 readable
// bytes beyond their last data byte.
void rt_mac_materialize_packed(long n, long nbytes, long sbb,
                               const uint8_t *base, const int64_t *offs,
                               int nsub,
                               const uint8_t *st0, const int64_t *pos0,
                               const int64_t *len0,
                               const uint8_t *st1, const int64_t *pos1,
                               const int64_t *len1,
                               uint8_t *packed, int64_t *ones,
                               int nthreads) {
    auto work = [&](long lo_, long hi_) {
        for (long i = lo_; i < hi_; i++) {
            uint8_t *ob = packed + i * nbytes;
            memcpy(ob, base + i * sbb, sbb);
            for (int c = 0; c < nsub; c++) {
                const uint8_t *st = c ? st1 : st0;
                int64_t pos = c ? pos1[i] : pos0[i];
                long ln = (long)(c ? len1[i] : len0[i]);
                if (ln <= 0) continue;
                uint64_t w0, w1;
                memcpy(&w0, st + (pos >> 3), 8);
                memcpy(&w1, st + (pos >> 3) + 8, 8);
                int sh = (int)(pos & 7);
                uint64_t vlo = sh ? (w0 >> sh) | (w1 << (64 - sh)) : w0;
                uint64_t vhi = sh ? (w1 >> sh) : w1;
                if (ln < 64) {
                    vlo &= (1ull << ln) - 1;
                    vhi = 0;
                } else if (ln == 64) {
                    vhi = 0;
                } else if (ln - 64 < 64) {
                    vhi &= (1ull << (ln - 64)) - 1;
                }
                int64_t off = offs[c];
                long ob0 = (long)(off >> 3);
                int osh = (int)(off & 7);
                uint64_t v0 = vlo << osh;
                uint64_t v1 = osh ? (vhi << osh) | (vlo >> (64 - osh))
                                  : vhi;
                uint64_t v2 = osh ? (vhi >> (64 - osh)) : 0ull;
                if (nbytes - ob0 >= 24) {
                    uint64_t d;
                    memcpy(&d, ob + ob0, 8);
                    d ^= v0;
                    memcpy(ob + ob0, &d, 8);
                    memcpy(&d, ob + ob0 + 8, 8);
                    d ^= v1;
                    memcpy(ob + ob0 + 8, &d, 8);
                    if (v2) {
                        memcpy(&d, ob + ob0 + 16, 8);
                        d ^= v2;
                        memcpy(ob + ob0 + 16, &d, 8);
                    }
                } else {
                    uint8_t vb[24];
                    memcpy(vb, &v0, 8);
                    memcpy(vb + 8, &v1, 8);
                    memcpy(vb + 16, &v2, 8);
                    long nb = (long)((off + ln + 7) / 8) - ob0;
                    for (long b = 0; b < nb && ob0 + b < nbytes; b++)
                        ob[ob0 + b] ^= vb[b];
                }
            }
            long cnt = 0;
            long j = 0;
            for (; j + 8 <= sbb; j += 8) {
                uint64_t w;
                memcpy(&w, ob + j, 8);
                cnt += __builtin_popcountll(w);
            }
            for (; j < sbb; j++) cnt += __builtin_popcount(ob[j]);
            ones[i] = cnt;
        }
    };
    if (nthreads <= 1 || n < 2048) {
        work(0, n);
        return;
    }
    std::vector<std::thread> ts;
    long per = (n + nthreads - 1) / nthreads;
    for (int t = 1; t < nthreads; t++) {
        long i0_ = t * per, i1_ = i0_ + per > n ? n : i0_ + per;
        if (i0_ >= i1_) break;
        ts.emplace_back(work, i0_, i1_);
    }
    work(0, per > n ? n : per);
    for (auto &th : ts) th.join();
}

}  // extern "C"
