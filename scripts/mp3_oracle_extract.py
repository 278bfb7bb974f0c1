#!/usr/bin/env python
"""Recover the MPEG-1 Layer III constant tables from the system libmpg123 by
behavioral system identification, and emit whisperseg_tpu/audio/mp3_tables.py.

Why: the Layer III synthesis window (ISO 11172-3 Table B.3, 512 taps), the
34 Huffman codebooks (Table B.7) and the scalefactor band edges (Table B.8)
are pure spec DATA. Rather than transcribing them (unverifiable here — the
spec is not in this environment), this script derives each one from the
authoritative decoder already in the image, using crafted bitstreams
(whisperseg_tpu/audio/mp3_craft.py) whose decoded PCM uniquely determines
the table entries:

  stage 1  synthesis window: count1-region impulse streams make PCM a LINEAR
           function of the 512 window taps (the IMDCT/matrixing half is
           closed-form); least squares + snap-to-1/65536 grid recovers them
           exactly, and the residual is the proof.
  stage 2  Huffman codebooks: depth-first walk of each code tree, using a
           known count1 quadruple as an alignment probe after each candidate
           prefix; the decoded spectrum (read back through the stage-1
           model) reveals codeword boundaries and (x, y) values.
  stage 3  scalefactor band edges: raise one scalefactor at a time over an
           all-ones spectrum; the attenuated bin range IS the band.

Run:  python scripts/mp3_oracle_extract.py --stage 1
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisperseg_tpu.audio import mpg123  # noqa: E402
from whisperseg_tpu.audio.mp3_craft import Granule, craft_stream  # noqa: E402
from whisperseg_tpu.audio.mp3_dsp import (Synth, antialias,  # noqa: E402
                                          imdct_granule)

SR = 32000


def count1_bits(quads, code_map, sign_neg_is_1, order_fwd):
    """Quadruple values (each in {-1,0,1}^4, bin order) -> table-B bits."""
    bits = []
    for q in quads:
        vals = q if order_fwd else q[::-1]
        n = 0
        for v in vals:
            n = (n << 1) | (1 if v != 0 else 0)
        code = n if code_map == "identity" else (~n & 0xF)
        bits.append(format(code, "04b"))
        for v in vals:
            if v != 0:
                neg = v < 0
                bits.append("1" if (neg == sign_neg_is_1) else "0")
    return "".join(bits)


def spectrum_from_quads(quads, global_gain):
    s = np.zeros(576)
    g = 2.0 ** ((global_gain - 210) / 4.0)
    for i, q in enumerate(quads):
        for j, v in enumerate(q):
            if v and 4 * i + j < 576:
                s[4 * i + j] = v * g
    return s


def model_rows(spectra):
    """Spectra (one per granule) -> (A_indices u-vectors, sample count).

    Returns the per-sample u vectors: pcm[k] = sum_i u_k[j + 32 i] * D[j+32i]
    where j = k % 32. Packed as an array U of shape (n_samples, 16) plus the
    column indices (n_samples, 16)."""
    synth = Synth(np.zeros(512))
    overlap = np.zeros((32, 18))
    rows_u, rows_c = [], []
    for s in spectra:
        s = antialias(s.copy())
        ss = np.empty((18, 32))
        for sb in range(32):
            block = imdct_granule(s[sb * 18:(sb + 1) * 18], 0)
            ss[:, sb] = block[:18] + overlap[sb]
            overlap[sb] = block[18:]
        # frequency inversion: odd subbands, odd time steps
        for sb in range(1, 32, 2):
            ss[1::2, sb] *= -1.0
        for t in range(18):
            u = synth.collect_u(ss[t])
            for j in range(32):
                cols = j + 32 * np.arange(16)
                rows_u.append(u[cols])
                rows_c.append(cols)
    return np.asarray(rows_u), np.asarray(rows_c)


def solve_window(pcm, rows_u, rows_c):
    n = len(rows_u)
    a = np.zeros((n, 512))
    a[np.arange(n)[:, None], rows_c] = rows_u
    d, res, rank, _ = np.linalg.lstsq(a, pcm[:n], rcond=None)
    pred = a @ d
    resid = float(np.sqrt(np.mean((pred - pcm[:n]) ** 2)))
    scale = float(np.sqrt(np.mean(pcm[:n] ** 2))) or 1.0
    return d, resid / scale


def stage1(out_path, verbose=True):
    rng = np.random.RandomState(7)
    n_frames = 10
    gg = 170  # |xr| = 2^-10: well clear of the wrapper's [-1, 1] clip
    all_quads = []
    for _ in range(2 * n_frames):
        quads = rng.choice([-1, 0, 1], size=(144, 4),
                           p=[0.15, 0.7, 0.15]).tolist()
        all_quads.append(quads)

    best = None
    for code_map in ("complement", "identity"):
        for sign_neg_is_1 in (True, False):
            for order_fwd in (True, False):
                grans = []
                for quads in all_quads:
                    bits = count1_bits(quads, code_map, sign_neg_is_1,
                                       order_fwd)
                    grans.append(Granule(main_bits=bits, global_gain=gg))
                stream = craft_stream(grans, sr=SR)
                pcm, sr = mpg123.decode_mp3(stream)
                assert sr == SR, sr
                pcm = pcm[:, 0].astype(np.float64)
                spectra = [spectrum_from_quads(q, gg) for q in all_quads]
                rows_u, rows_c = model_rows(spectra)
                if len(pcm) < len(rows_u):
                    if verbose:
                        print(f"  [{code_map} neg1={sign_neg_is_1} "
                              f"fwd={order_fwd}] pcm too short "
                              f"({len(pcm)} < {len(rows_u)})")
                    continue
                d, rel = solve_window(pcm, rows_u, rows_c)
                if verbose:
                    print(f"  [{code_map} neg1={sign_neg_is_1} "
                          f"fwd={order_fwd}] rel-residual {rel:.3e}")
                if best is None or rel < best[0]:
                    best = (rel, code_map, sign_neg_is_1, order_fwd, d)

    rel, code_map, sign1, fwd, d = best
    print(f"best hypothesis: code={code_map} signbit1_is_neg={sign1} "
          f"order_fwd={fwd} rel-residual={rel:.3e}")
    # snap to the spec's 1/65536 grid
    ints = np.round(d * 65536.0)
    snap_err = float(np.max(np.abs(d * 65536.0 - ints)))
    print(f"snap-to-1/65536: max deviation {snap_err:.4f} ulp "
          f"(int range [{int(ints.min())}, {int(ints.max())}])")
    result = {
        "hypothesis": {"count1B_code": code_map, "sign_bit_1_is_negative":
                       sign1, "quad_order_forward": fwd},
        "rel_residual": rel, "snap_err_ulp": snap_err,
        "window_int65536": [int(v) for v in ints],
        "window_float": [float(v) for v in d],
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"wrote {out_path}")
    return result


# --------------------------------------------------------------- stage 2

GG = 170  # |xr| scale 2^-10 keeps PCM well inside [-1, 1] for value 15


class Readout:
    """Invert mpg123 PCM back to the granule spectrum, given the solved
    synthesis window. Probes are spaced every 3rd granule so each sees a
    clean decoder state (overlap tail + 16-step synthesis FIFO both flushed
    by two intervening silent granules)."""

    def __init__(self, window):
        self.window = np.asarray(window)
        # 2 granules of PCM per probe: the synthesis FIFO delays part of a
        # granule's energy into the next 512 samples, so one granule's 576
        # samples underdetermine the spectrum (singular M)
        m = np.zeros((1152, 576))
        for b in range(576):
            s = np.zeros(576)
            s[b] = 1.0
            m[:, b] = self._probe_pcm(s)
        self.m = m
        self.minv = np.linalg.pinv(m)

    def _probe_pcm(self, s):
        """PCM of [probe granule, silent granule] from clean state."""
        synth = Synth(self.window)
        s = antialias(s.copy())
        out = np.empty(1152)
        blocks = np.empty((36, 32))
        for sb in range(32):
            blocks[:, sb] = imdct_granule(s[sb * 18:(sb + 1) * 18], 0)
        for sb in range(1, 32, 2):
            blocks[1::2, sb] *= -1.0
        for t in range(36):  # granule 2 inputs = overlap tail
            out[t * 32:(t + 1) * 32] = synth.step(blocks[t])
        return out

    def spectra(self, pcm, n_probes):
        """PCM of a 3n-granule stream -> list of n probe spectra."""
        out = []
        for i in range(n_probes):
            seg = pcm[3 * i * 576: (3 * i + 2) * 576]
            out.append(self.minv @ seg)
        return out


def batch_decode(granule_list):
    """Each entry becomes granule 3i (two silent granules follow)."""
    gs = []
    for g in granule_list:
        gs += [g, Granule(), Granule()]
    pcm, sr = mpg123.decode_mp3(craft_stream(gs, sr=SR))
    return pcm[:, 0].astype(np.float64)


_VALUE = {round(v ** (4.0 / 3.0) * 2.0 ** ((GG - 210) / 4.0), 10): v
          for v in range(16)}
_VALS = np.array(sorted(_VALUE))


def classify(x):
    """measured |xr| -> integer value 0..15, or None if off-grid"""
    i = int(np.argmin(np.abs(_VALS - abs(x))))
    v = _VALUE[_VALS[i]]
    expected = _VALS[i]
    tol = max(1e-6, expected * 1e-4)
    return v if abs(abs(x) - expected) < tol else None


B_QUAD = "00000000"  # count1 table B: (1,1,1,1) all-positive probe
GAIN = 2.0 ** ((GG - 210) / 4.0)


def probe_variants(prefix, linbits):
    """All alignment hypotheses for 'prefix is a complete codeword'."""
    out = []
    for ex in (0, 1) if linbits else (0,):
        for ey in (0, 1) if linbits else (0,):
            for cx in ((1,) if ex else (0, 1)):
                for cy in ((1,) if ey else (0, 1)):
                    bits = (prefix + ("0" * linbits if ex else "")
                            + ("0" * cx)
                            + ("0" * linbits if ey else "") + ("0" * cy)
                            + B_QUAD)
                    out.append((bits, ex, ey, cx, cy))
    return out


def check_spectrum(spec, ex, ey, cx, cy):
    """Does the readout match 'pair (x,y) then +1,+1,+1,+1'? -> (x,y) or None"""
    if np.max(np.abs(spec[6:])) > 1e-6:
        return None
    for b in range(2, 6):
        if abs(spec[b] - GAIN) > 1e-6:
            return None
    x = classify(spec[0])
    y = classify(spec[1])
    if x is None or y is None or spec[0] < -1e-6 or spec[1] < -1e-6:
        return None
    if (x != 0) != bool(cx) or (y != 0) != bool(cy):
        return None
    if ex and x != 15 or ey and y != 15:
        return None
    return (x, y)


def extract_big_table(table_id, linbits, readout, max_len=19,
                      batch_size=48):
    """BFS walk of one big-values codebook via alignment probes."""
    from collections import deque

    codes = {}
    frontier = deque(["0", "1"])
    while frontier:
        batch = []
        while frontier and len(batch) < batch_size:
            batch.append(frontier.popleft())
        probes = []  # (prefix, variant)
        for p in batch:
            for var in probe_variants(p, linbits):
                probes.append((p, var))
        grans = [Granule(main_bits=v[0], big_values=1,
                         table_select=(table_id, 0, 0), global_gain=GG)
                 for _, v in probes]
        pcm = batch_decode(grans)
        spectra = readout.spectra(pcm, len(probes))
        resolved = {}
        for (p, (bits, ex, ey, cx, cy)), spec in zip(probes, spectra):
            if p in resolved:
                continue
            res = check_spectrum(spec, ex, ey, cx, cy)
            if res is not None:
                resolved[p] = res
        for p in batch:
            if p in resolved:
                codes[p] = resolved[p]
            elif len(p) < max_len:
                frontier.append(p + "0")
                frontier.append(p + "1")
    return codes


def extract_count1_table(select, readout, batch_size=48):
    """Count1 codebook (16 quadruple codes, lens <= 6 + signs)."""
    from collections import deque

    codes = {}
    frontier = deque(["0", "1"])
    while frontier:
        batch = []
        while frontier and len(batch) < batch_size:
            batch.append(frontier.popleft())
        probes = []
        for p in batch:
            for c in range(6):  # number of sign bits = nonzero count
                bits = p + "0" * c
                probes.append((p, c, bits))
        grans = [Granule(main_bits=bits, big_values=0,
                         count1table_select=select, global_gain=GG,
                         part2_3_length=len(bits))
                 for _, _, bits in probes]
        pcm = batch_decode(grans)
        spectra = readout.spectra(pcm, len(probes))
        accepted = {}  # p -> {c: quad}
        for (p, c, bits), spec in zip(probes, spectra):
            if np.max(np.abs(spec[4:])) > 1e-6:
                continue
            quad = []
            ok = True
            for b in range(4):
                v = classify(spec[b])
                if v is None or v > 1 or spec[b] < -1e-6:
                    ok = False
                    break
                quad.append(v)
            if ok and sum(quad) == c:
                accepted.setdefault(p, {})[c] = tuple(quad)
        for p in batch:
            accs = accepted.get(p, {})
            # mpg123 zero-fills on bit exhaustion, so undersized sign counts
            # produce truncated (still-consistent) quads: the TRUE quad is
            # the largest accepted sign count, and the next count up must
            # have been rejected. The all-zero quad (c=0) stays ambiguous
            # with "decoder gave up" and is recovered from the prefix-space
            # complement below.
            cmax = max(accs) if accs else -1
            if cmax > 0 and (cmax + 1) not in accs:
                codes[p] = accs[cmax]
            elif len(p) < 8:
                frontier.append(p + "0")
                frontier.append(p + "1")

    def minimal_uncovered(prefix=""):
        if prefix in codes:
            return []
        if not any(c.startswith(prefix) for c in codes):
            return [prefix]
        if len(prefix) > 8:
            return [prefix]
        return (minimal_uncovered(prefix + "0")
                + minimal_uncovered(prefix + "1"))

    gaps = minimal_uncovered()
    assert len(gaps) == 1, f"count1 zero-quad code ambiguous: {gaps}"
    codes[gaps[0]] = (0, 0, 0, 0)
    return codes


def validate_codebook(codes, expect_grid=None):
    kraft = sum(2.0 ** -len(c) for c in codes)
    vals = list(codes.values())
    dup = len(vals) != len(set(vals))
    pref = any(a != b and b.startswith(a) for a in codes for b in codes)
    ok = abs(kraft - 1.0) < 1e-12 and not dup and not pref
    if expect_grid is not None and set(vals) != expect_grid:
        ok = False
    return ok, kraft


# (linbits per table, ISO 11172-3 Table B.7 headers; confirmed empirically in
# stage 2b by decoding an ESC codeword with a nonzero linbits field)
TABLE_LINBITS = {16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
                 24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13}
PAIR_TABLES = [1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15] + \
    list(range(16, 32))
GRID = {(3, 3): {(x, y) for x in range(3) for y in range(3)}}


def expected_grid(table_id):
    if table_id == 1:
        n = 2
    elif table_id in (2, 3):
        n = 3
    elif table_id in (5, 6):
        n = 4
    elif table_id in (7, 8, 9):
        n = 6
    elif table_id in (10, 11, 12):
        n = 8
    else:
        n = 16
    return {(x, y) for x in range(n) for y in range(n)}


def stage2(window, out_path):
    readout = Readout(window)
    # methodology check: the count1 extractor must reproduce table B
    # (= 4-bit complement codes, established in stage 1)
    b = extract_count1_table(1, readout)
    b_expect = {format(~n & 0xF, "04b"):
                tuple((n >> (3 - i)) & 1 for i in range(4))
                for n in range(16)}
    assert b == b_expect, f"count1-B methodology check failed: {b}"
    print("count1 B reproduced exactly (methodology validated)")
    a = extract_count1_table(0, readout)
    ok, kraft = validate_codebook(a)
    print(f"count1 A: {len(a)} codes, kraft={kraft}, ok={ok}")
    assert ok and len(a) == 16

    tables = {"count1A": {c: list(v) for c, v in a.items()}}
    for t in PAIR_TABLES:
        lb = TABLE_LINBITS.get(t, 0)
        codes = extract_big_table(t, lb, readout)
        ok, kraft = validate_codebook(codes, expected_grid(t))
        print(f"table {t} (linbits {lb}): {len(codes)} codes, "
              f"kraft={kraft:.12f}, ok={ok}", flush=True)
        assert ok, f"table {t} failed structural validation"
        tables[str(t)] = {c: list(v) for c, v in codes.items()}

    with open(out_path, "w") as f:
        json.dump(tables, f)
    print(f"wrote {out_path}")


def stage2b_linbits(window):
    """Confirm each ESC table's linbits width: decode x=15 + linval=1."""
    readout = Readout(window)
    tabs = json.load(open("/tmp/mp3_stage2.json"))
    for t, lb in sorted(TABLE_LINBITS.items()):
        codes = {c: tuple(v) for c, v in tabs[str(t)].items()}
        code150 = next(c for c, v in codes.items() if v == (15, 0))
        bits = code150 + format(1, f"0{lb}b") + "0" + B_QUAD
        pcm = batch_decode([Granule(main_bits=bits, big_values=1,
                                    table_select=(t, 0, 0),
                                    global_gain=GG)])
        spec = readout.spectra(pcm, 1)[0]
        got = abs(spec[0]) / GAIN
        expect = 16.0 ** (4.0 / 3.0)
        ok = abs(got - expect) < 1e-3 * expect
        print(f"table {t}: linbits={lb} -> |x|={got:.4f} "
              f"(expect {expect:.4f}) ok={ok}")
        assert ok, f"table {t} linbits mismatch"


# --------------------------------------------------------------- stage 3

# hypotheses under test (ISO 11172-3 Table B.8 / 2.4.2.7); stage 3 verifies
# each by predicting mpg123's PCM exactly (<1e-5 relative) under crafted
# scalefactor patterns
SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
            162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
            156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
            194, 240, 296, 364, 448, 550, 576],
}
PRETAB = [0] * 11 + [1, 1, 1, 1, 2, 2, 3, 3, 3, 2]
SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]


def _sf_bits(sf, sc):
    bits = []
    for b in range(11):
        bits.append(format(sf[b], f"0{SLEN1[sc]}b") if SLEN1[sc] else "")
    for b in range(11, 21):
        bits.append(format(sf[b], f"0{SLEN2[sc]}b") if SLEN2[sc] else "")
    return "".join(bits)


def _ones_quads_bits(n_quads=144):
    return "00000000" * n_quads  # (1,1,1,1) all-positive, table B


def _predict_spectrum(sf, sc, preflag, sfs, gg, edges):
    spec = np.ones(576) * 2.0 ** ((gg - 210) / 4.0)
    for b in range(21):
        pre = PRETAB[b] if preflag else 0
        att = 2.0 ** (-0.5 * (1 + sfs) * (sf[b] + pre))
        spec[edges[b]: edges[b + 1]] *= att
    return spec


def stage3(window):
    readout = Readout(window)
    rng = np.random.RandomState(3)
    for sr in (44100, 48000, 32000):
        edges = SFB_LONG[sr]
        probes = []   # (sf, sc, preflag, sfs)
        for sc in range(16):
            sf = [(rng.randint(2 ** SLEN1[sc]) if b < 11 else
                   rng.randint(2 ** SLEN2[sc])) for b in range(21)]
            probes.append((sf, sc, 0, 0))
        probes.append(([0] * 21, 0, 1, 0))          # pretab alone
        probes.append(([min(b + 1, 15 if b < 11 else 7) for b in range(21)],
                       15, 1, 1))                   # everything at once
        grans = []
        for sf, sc, preflag, sfs in probes:
            bits = _sf_bits(sf, sc) + _ones_quads_bits()
            grans.append(Granule(main_bits=bits, big_values=0,
                                 scalefac_compress=sc, preflag=preflag,
                                 scalefac_scale=sfs, global_gain=140))
        gs = []
        for g in grans:
            gs += [g, Granule(), Granule()]
        pcm, got_sr = mpg123.decode_mp3(craft_stream(gs, sr=sr))
        assert got_sr == sr
        pcm = pcm[:, 0].astype(np.float64)
        worst = 0.0
        for i, (sf, sc, preflag, sfs) in enumerate(probes):
            spec = _predict_spectrum(sf, sc, preflag, sfs, 140, edges)
            pred = readout.m @ spec
            seg = pcm[3 * i * 576: (3 * i + 2) * 576]
            rel = (np.sqrt(np.mean((pred - seg) ** 2))
                   / np.sqrt(np.mean(pred ** 2)))
            worst = max(worst, rel)
        print(f"sr {sr}: {len(probes)} scalefactor probes, worst "
              f"rel-residual {worst:.3e} -> "
              f"{'OK' if worst < 1e-5 else 'MISMATCH'}")
        assert worst < 1e-5, f"sfb/slen/pretab hypothesis failed at {sr}"
    print("long sfb tables, slen table, pretab: all confirmed")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", default="1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.stage == "1":
        stage1(args.out or "/tmp/mp3_stage1.json")
    elif args.stage == "2":
        window = np.array(json.load(open("/tmp/mp3_stage1.json"))
                          ["window_float"])
        stage2(window, args.out or "/tmp/mp3_stage2.json")
    elif args.stage == "2b":
        window = np.array(json.load(open("/tmp/mp3_stage1.json"))
                          ["window_float"])
        stage2b_linbits(window)
    elif args.stage == "3":
        window = np.array(json.load(open("/tmp/mp3_stage1.json"))
                          ["window_float"])
        stage3(window)
    else:
        raise SystemExit("stage not implemented yet")


if __name__ == "__main__":
    main()
