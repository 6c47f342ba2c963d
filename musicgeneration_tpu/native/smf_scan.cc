// Native SMF (Standard MIDI File) scanner — the tokenizer pipeline's hot
// loop (byte-level VLQ/event parsing + note on/off pairing), in C++.
//
// Semantics mirror the pure-Python oracle in musicgeneration_tpu/midi/smf.py
// (_scan_track / _build) exactly; tests compare both paths file-by-file:
//   * running status, VLQ deltas, meta/sysex handling, end-of-track break,
//   * junk-before-MThd recovery, unknown chunk skip, truncated-file grace,
//   * pretty_midi note pairing: a note-off closes ALL open notes of that
//     (channel, pitch) with off_tick > start (zero-length dropped),
//     orphan note-ons are dropped,
//   * program-change resolution at the note's START tick (smf.py _program_at),
//   * unhandled status bytes abort the parse (error=1) so the Python
//     fallback can take over.
//
// C ABI (ctypes): one mg_parse() per file buffer, results in flat arrays
// the Python wrapper turns into numpy views and groups vectorized.
//
// Build: make -C musicgeneration_tpu/native     (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <utility>
#include <vector>

namespace {

struct Cursor {
    const uint8_t* data;
    int64_t n;
    int64_t pos = 0;
    bool ok = true;

    uint8_t peek() {
        if (pos >= n) { ok = false; return 0; }
        return data[pos];
    }
    uint8_t take() {
        if (pos >= n) { ok = false; return 0; }
        return data[pos++];
    }
    int64_t vlq() {
        int64_t v = 0;
        for (int i = 0; i < 8; ++i) {
            uint8_t b = take();
            if (!ok) return 0;
            v = (v << 7) | (b & 0x7F);
            if (!(b & 0x80)) break;
        }
        return v;
    }
};

struct OpenNote { int64_t start; int32_t vel; };

}  // namespace

extern "C" {

struct MgParse {
    // notes: [n, 7] = track, channel, program, pitch, velocity, start, end
    int64_t* notes; int64_t n_notes;
    // controls: [n, 6] = track, channel, program, number, value, tick
    int64_t* controls; int64_t n_controls;
    // tempos: [n, 2] = tick, us_per_quarter  (already merged + stable-sorted)
    int64_t* tempos; int64_t n_tempos;
    // metas: [n, 5] = track, tick, type, payload_offset, payload_len
    //   (type 0x03 track name, 0x06 marker, 0x58 time signature — payload
    //    decoded by the Python wrapper from the original buffer)
    int64_t* metas; int64_t n_metas;
    int32_t n_tracks;
    int32_t ticks_per_beat;
    int64_t max_tick;
    int32_t error;  // 0 ok; 1 unhandled status; 2 not midi; 3 smpte
};

static int64_t* flat(const std::vector<int64_t>& v) {
    auto* p = static_cast<int64_t*>(std::malloc(
        v.size() * sizeof(int64_t) + 1));
    std::memcpy(p, v.data(), v.size() * sizeof(int64_t));
    return p;
}

MgParse* mg_parse(const uint8_t* data, int64_t n) {
    auto* out = static_cast<MgParse*>(std::calloc(1, sizeof(MgParse)));

    // header (with junk-prefix recovery)
    int64_t start = -1;
    for (int64_t i = 0; i + 14 <= n; ++i) {
        if (std::memcmp(data + i, "MThd", 4) == 0) { start = i; break; }
    }
    if (start < 0) { out->error = 2; return out; }
    const uint8_t* d = data + start;
    int64_t nn = n - start;
    auto be32 = [&](int64_t p) -> uint32_t {
        return (uint32_t(d[p]) << 24) | (uint32_t(d[p + 1]) << 16) |
               (uint32_t(d[p + 2]) << 8) | uint32_t(d[p + 3]);
    };
    auto be16 = [&](int64_t p) -> uint32_t {
        return (uint32_t(d[p]) << 8) | uint32_t(d[p + 1]);
    };
    uint32_t hlen = be32(4);
    uint32_t ntracks = be16(10);
    uint32_t division = be16(12);
    if (division & 0x8000) { out->error = 3; return out; }
    out->ticks_per_beat = static_cast<int32_t>(division);

    std::vector<int64_t> notes, controls, tempos, metas;
    int64_t max_tick = 0;
    int64_t pos = 8 + hlen;
    int32_t track_idx = 0;

    for (uint32_t ti = 0; ti < ntracks; ++ti) {
        if (pos + 8 > nn) break;  // truncated: parse what we have
        if (std::memcmp(d + pos, "MTrk", 4) != 0) {
            pos += 8 + be32(pos + 4);
            continue;
        }
        int64_t clen = be32(pos + 4);
        int64_t tstart = pos + 8;
        int64_t tend = tstart + clen;
        if (tend > nn) tend = nn;
        Cursor c{d + tstart, tend - tstart};

        // per-track state (smf.py _build is per-track)
        // program changes per channel: (tick, program) in order
        std::vector<std::pair<int64_t, int32_t>> progs[16];
        std::vector<OpenNote> open[16][128];
        int64_t tick = 0;
        uint8_t status = 0;

        auto program_at = [&](int ch, int64_t t) -> int32_t {
            int32_t p = 0;
            for (auto& pr : progs[ch]) {
                if (pr.first <= t) p = pr.second; else break;
            }
            return p;
        };

        while (c.pos < c.n && c.ok) {
            tick += c.vlq();
            if (!c.ok) break;
            uint8_t b = c.peek();
            if (b & 0x80) { status = b; c.pos++; }
            uint8_t ev = status & 0xF0;
            int ch = status & 0x0F;
            if (ev == 0x90 || ev == 0x80) {
                uint8_t pitch = c.take() & 0x7F;
                uint8_t vel = (ev == 0x90) ? c.take() : (c.take(), 0);
                if (!c.ok) break;
                bool is_on = (ev == 0x90) && vel > 0;
                if (is_on) {
                    open[ch][pitch].push_back({tick, vel});
                } else {
                    auto& stack = open[ch][pitch];
                    if (!stack.empty()) {
                        std::vector<OpenNote> keep;
                        for (auto& onote : stack) {
                            if (tick > onote.start) {
                                notes.insert(notes.end(), {
                                    track_idx, ch,
                                    program_at(ch, onote.start),
                                    pitch, onote.vel, onote.start, tick});
                            } else {
                                keep.push_back(onote);
                            }
                        }
                        stack.swap(keep);
                    }
                }
                if (tick > max_tick) max_tick = tick;
            } else if (ev == 0xB0) {
                uint8_t num = c.take();
                uint8_t val = c.take();
                if (!c.ok) break;
                controls.insert(controls.end(), {
                    track_idx, ch, -1 /*program filled on flush*/,
                    num, val, tick});
            } else if (ev == 0xC0) {
                uint8_t prog = c.take();
                if (!c.ok) break;
                progs[ch].push_back({tick, prog});
            } else if (ev == 0xA0 || ev == 0xE0) {
                c.pos += 2;
            } else if (ev == 0xD0) {
                c.pos += 1;
            } else if (status == 0xFF) {
                uint8_t meta_type = c.take();
                int64_t len = c.vlq();
                if (!c.ok) break;
                int64_t payload = start + tstart + c.pos;
                if (meta_type == 0x51 && len == 3) {
                    // guard: a file truncated inside the tempo payload must
                    // not read past the buffer (corpus MIDI is untrusted)
                    if (c.pos + 3 > c.n) break;
                    int64_t us = (int64_t(c.data[c.pos]) << 16) |
                                 (int64_t(c.data[c.pos + 1]) << 8) |
                                 int64_t(c.data[c.pos + 2]);
                    tempos.insert(tempos.end(), {tick, us});
                } else if (meta_type == 0x03 || meta_type == 0x06 ||
                           meta_type == 0x58) {
                    metas.insert(metas.end(), {
                        track_idx, tick, meta_type, payload, len});
                }
                c.pos += len;
                if (meta_type == 0x2F) break;  // end of track
            } else if (status == 0xF0 || status == 0xF7) {
                int64_t len = c.vlq();
                c.pos += len;
            } else {
                out->error = 1;  // unhandled status -> Python fallback
                return out;
            }
        }
        // resolve control programs now that the track's changes are known
        // (controls were recorded before later program changes could land,
        //  matching Python which resolves per-track after the scan)
        for (int64_t i = (int64_t)controls.size() - 6; i >= 0; i -= 6) {
            if (controls[i] != track_idx) break;
            controls[i + 2] = program_at((int)controls[i + 1],
                                         controls[i + 5]);
        }
        pos += 8 + clen;
        track_idx++;
    }

    // stable sort tempos by tick (python: tempo.sort by tick, stable)
    std::vector<std::pair<int64_t, int64_t>> tp;
    for (size_t i = 0; i + 1 < tempos.size(); i += 2)
        tp.push_back({tempos[i], tempos[i + 1]});
    std::stable_sort(tp.begin(), tp.end(),
                     [](auto& a, auto& b) { return a.first < b.first; });
    tempos.clear();
    for (auto& t : tp) { tempos.push_back(t.first); tempos.push_back(t.second); }

    out->notes = flat(notes); out->n_notes = notes.size() / 7;
    out->controls = flat(controls); out->n_controls = controls.size() / 6;
    out->tempos = flat(tempos); out->n_tempos = tempos.size() / 2;
    out->metas = flat(metas); out->n_metas = metas.size() / 5;
    out->n_tracks = track_idx;
    out->max_tick = max_tick;
    return out;
}

void mg_free(MgParse* p) {
    if (!p) return;
    std::free(p->notes);
    std::free(p->controls);
    std::free(p->tempos);
    std::free(p->metas);
    std::free(p);
}

// MIDI-like event emission (the tokenizer hot loop after SMF parsing).
//
// Exact C++ transcription of the reference algorithm
// (mg/model/utils/sequence.py:145-183), oracle-tested against the Python
// EventSeq.from_note_seq in tests/test_native_smf.py:
//   * per note IN CALLER ORDER: clip velocity to [vel_lo, vel_hi-1],
//     velocity index = searchsorted-left over vel_bins, emit
//     (velocity, note_on) at start and note_off at end; pitches outside
//     [pitch_lo, pitch_hi) are dropped (:151-163),
//   * stable sort all events by time (:164),
//   * between consecutive events greedily emit time_shift tokens:
//     index = searchsorted-right(bins, remainder) - 1 while remainder >=
//     bins[0] (:174-181) — IEEE-double identical to the numpy loop.
//
// Bin arrays and token-id offsets are PASSED IN from the Python vocab
// spec so the constants live in exactly one place. Returns the token
// count, or -1 if `cap` is too small (caller falls back to Python).
int64_t mg_encode_midilike(
    const double* starts, const double* ends,
    const int64_t* pitches, const int64_t* vels, int64_t n,
    const double* vel_bins, int64_t n_vel,
    const double* ts_bins, int64_t n_ts,
    int64_t pitch_lo, int64_t pitch_hi,
    int64_t vel_lo, int64_t vel_hi,
    int64_t off_on, int64_t off_off, int64_t off_vel, int64_t off_ts,
    uint16_t* out, int64_t cap) {
    struct Ev { double t; uint16_t tok; };
    std::vector<Ev> evs;
    evs.reserve(static_cast<size_t>(3 * n));
    for (int64_t i = 0; i < n; ++i) {
        int64_t p = pitches[i];
        if (p < pitch_lo || p >= pitch_hi) continue;
        int64_t v = vels[i];
        if (v < vel_lo) v = vel_lo;
        if (v > vel_hi - 1) v = vel_hi - 1;
        int64_t vi = std::lower_bound(vel_bins, vel_bins + n_vel,
                                      static_cast<double>(v)) - vel_bins;
        evs.push_back({starts[i], static_cast<uint16_t>(off_vel + vi)});
        evs.push_back({starts[i],
                       static_cast<uint16_t>(off_on + (p - pitch_lo))});
        evs.push_back({ends[i],
                       static_cast<uint16_t>(off_off + (p - pitch_lo))});
    }
    std::stable_sort(evs.begin(), evs.end(),
                     [](const Ev& a, const Ev& b) { return a.t < b.t; });
    int64_t m = 0;
    if (n_ts <= 0) return -1;
    const double bin0 = ts_bins[0];
    for (size_t i = 0; i < evs.size(); ++i) {
        if (m >= cap) return -1;
        out[m++] = evs[i].tok;
        if (i + 1 == evs.size()) break;
        double interval = evs[i + 1].t - evs[i].t;
        double shift = 0.0;
        while (interval - shift >= bin0) {
            int64_t idx = (std::upper_bound(ts_bins, ts_bins + n_ts,
                                            interval - shift) - ts_bins) - 1;
            if (m >= cap) return -1;
            out[m++] = static_cast<uint16_t>(off_ts + idx);
            shift += ts_bins[idx];
        }
    }
    return m;
}

}  // extern "C"
