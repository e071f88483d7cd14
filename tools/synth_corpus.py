"""Synthesize a diverse musical corpus for full-scale training runs.

No real audio corpus is obtainable in this environment (zero network
egress; the only bundled audio is a handful of <1 s test tones in
scipy/IPython test suites). This generator is the closest obtainable
stand-in for the multi-hour corpora the reference README recommends
(reference README.md:75-90): multi-voice musical pieces built from
physically-motivated synthesis so the training distribution exercises
what real-world audio does — sharp transients, inharmonic partials,
formant structure, broadband noise, rhythm, chords, reverberant tails
and wide loudness/tempo/key variation.

Voices:
  * plucked strings  — additive partials with inharmonicity B·k², per-
    partial decay, attack noise (Karplus-Strong timbre without the IIR
    cost)
  * FM bells/keys    — 2-op FM with decaying modulation index
  * formant voice    — phase-accumulated glottal saw through vowel
    biquad formants, vibrato + jitter + breath noise
  * subtractive pads — detuned saw stacks through Butterworth lowpass
    with amplitude LFO
  * percussion       — pitch-swept kick, tone+noise snare, filtered
    noise hats, pattern-sequenced
  * drones/textures  — filtered noise beds and slow chords

Each piece mixes 1–4 voices over a random key/scale/tempo, applies a
synthetic room (exponentially decaying noise IR, FFT convolution) and a
randomized master level, and is written as 16-bit PCM WAV at 44.1 kHz.

Usage: python tools/synth_corpus.py --out DIR --minutes 140 [--seed 0]
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np
from scipy.io import wavfile
from scipy.signal import butter, fftconvolve, lfilter, sosfilt

SR = 44100

SCALES = {
    "major": [0, 2, 4, 5, 7, 9, 11],
    "minor": [0, 2, 3, 5, 7, 8, 10],
    "dorian": [0, 2, 3, 5, 7, 9, 10],
    "pent_min": [0, 3, 5, 7, 10],
    "pent_maj": [0, 2, 4, 7, 9],
}

VOWELS = {  # first three formant frequencies / bandwidths (Hz)
    "a": ([700, 1220, 2600], [130, 70, 160]),
    "e": ([530, 1840, 2480], [60, 90, 200]),
    "i": ([320, 2500, 3010], [60, 100, 160]),
    "o": ([500, 1000, 2500], [80, 80, 200]),
    "u": ([330, 870, 2250], [70, 70, 180]),
}


def midi_to_hz(m):
    return 440.0 * 2.0 ** ((np.asarray(m, np.float64) - 69.0) / 12.0)


def _env(n, attack_s, release_s):
    t = np.arange(n) / SR
    a = 1.0 - np.exp(-t / max(attack_s, 1e-4))
    r = np.ones(n)
    nr = min(n, int(release_s * SR))
    if nr > 1:
        r[-nr:] = np.linspace(1.0, 0.0, nr)
    return a * r


def pluck(f0, dur, rng, bright=1.0):
    """Additive plucked string: inharmonic partials with per-partial decay."""
    n = int(dur * SR)
    t = np.arange(n) / SR
    k_max = max(2, min(50, int(0.45 * SR / f0)))
    k = np.arange(1, k_max + 1)[:, None]
    B = 10 ** rng.uniform(-5.0, -3.3)  # stiffness inharmonicity
    fk = f0 * k * np.sqrt(1 + B * k * k)
    fk = fk[fk[:, 0] < 0.45 * SR, :]
    k = np.arange(1, len(fk) + 1)[:, None]
    tau = rng.uniform(0.25, 1.2) / (1 + 0.06 * k**1.5)
    amp = (1.0 / k**rng.uniform(0.8, 1.4)) * bright
    ph = rng.uniform(0, 2 * np.pi, (len(fk), 1))
    y = (amp * np.exp(-t[None, :] / tau) * np.sin(2 * np.pi * fk * t[None, :] + ph)).sum(0)
    # attack noise burst (the pluck excitation)
    nb = int(0.006 * SR)
    burst = rng.standard_normal(nb) * np.linspace(1, 0, nb) ** 2
    y[:nb] += 0.6 * burst
    y *= 1.0 - np.exp(-t / 0.002)
    return y


def fm_tone(f0, dur, rng):
    n = int(dur * SR)
    t = np.arange(n) / SR
    ratio = rng.choice([0.5, 1.0, 1.0, 2.0, 3.0, 3.5, 7.0])
    index = rng.uniform(0.5, 6.0) * np.exp(-t / rng.uniform(0.1, 0.8))
    mod = index * np.sin(2 * np.pi * f0 * ratio * t)
    y = np.sin(2 * np.pi * f0 * t + mod) * np.exp(-t / rng.uniform(0.3, 1.5))
    y *= 1.0 - np.exp(-t / 0.004)
    return y


def _saw_from_f0(f0_contour):
    phase = np.cumsum(f0_contour) / SR
    return 2.0 * (phase % 1.0) - 1.0


def _biquad_resonator(fc, bw):
    r = np.exp(-np.pi * bw / SR)
    theta = 2 * np.pi * fc / SR
    a = [1.0, -2 * r * np.cos(theta), r * r]
    b = [1.0 - r]
    return b, a


def formant_voice(f0, dur, rng):
    """Vowel phrase: glottal-ish saw + vibrato/jitter through formant biquads."""
    n = int(dur * SR)
    t = np.arange(n) / SR
    vib = 1 + 0.012 * np.sin(2 * np.pi * rng.uniform(4.5, 6.5) * t + rng.uniform(0, 6))
    jitter = 1 + 0.003 * lfilter([1], [1, -0.999], rng.standard_normal(n)) / 20.0
    glide = np.linspace(rng.uniform(0.97, 1.03), 1.0, n)
    src = _saw_from_f0(f0 * vib * jitter * glide)
    # gentle spectral tilt
    src = lfilter(*butter(1, 4000 / (SR / 2), "low"), src)
    vowel = VOWELS[rng.choice(list(VOWELS))]
    y = np.zeros(n)
    for fc, bw in zip(*vowel):
        b, a = _biquad_resonator(fc * rng.uniform(0.92, 1.08), bw)
        y += lfilter(b, a, src)
    breath = lfilter(*butter(2, [0.1, 0.5], "band"), rng.standard_normal(n))
    y = y / (np.abs(y).max() + 1e-9) + 0.02 * breath
    y *= _env(n, rng.uniform(0.02, 0.1), rng.uniform(0.05, 0.3))
    return y


def pad_chord(freqs, dur, rng):
    n = int(dur * SR)
    t = np.arange(n) / SR
    y = np.zeros(n)
    for f in freqs:
        for det in (1.0, 1 + rng.uniform(0.001, 0.004), 1 - rng.uniform(0.001, 0.004)):
            y += _saw_from_f0(np.full(n, f * det)) / (3 * len(freqs))
    cutoff = rng.uniform(400, 4000)
    sos = butter(2, cutoff / (SR / 2), "low", output="sos")
    y = sosfilt(sos, y)
    lfo = 1 + 0.25 * np.sin(2 * np.pi * rng.uniform(0.05, 0.4) * t + rng.uniform(0, 6))
    return y * lfo * _env(n, rng.uniform(0.2, 1.0), rng.uniform(0.5, 2.0))


def kick(rng):
    n = int(0.25 * SR)
    t = np.arange(n) / SR
    f = 50 + 110 * np.exp(-t / 0.03)
    y = np.sin(2 * np.pi * np.cumsum(f) / SR) * np.exp(-t / 0.12)
    y[: int(0.002 * SR)] += 0.5 * rng.standard_normal(int(0.002 * SR))
    return y


def snare(rng):
    n = int(0.22 * SR)
    t = np.arange(n) / SR
    noise = lfilter(*butter(2, [0.05, 0.6], "band"), rng.standard_normal(n))
    tone = np.sin(2 * np.pi * 185 * t)
    return (0.7 * noise + 0.4 * tone) * np.exp(-t / 0.06)


def hat(rng, open_=False):
    n = int((0.25 if open_ else 0.06) * SR)
    t = np.arange(n) / SR
    noise = lfilter(*butter(2, 0.55, "high"), rng.standard_normal(n))
    return noise * np.exp(-t / (0.09 if open_ else 0.015))


def drum_track(n, tempo, rng):
    y = np.zeros(n)
    spb = int(SR * 60 / tempo / 2)  # eighth notes
    pat_k = rng.random(16) < rng.uniform(0.2, 0.5)
    pat_k[0] = True
    pat_s = np.zeros(16, bool)
    pat_s[[4, 12]] = rng.random() < 0.9
    pat_h = rng.random(16) < rng.uniform(0.5, 0.95)
    i = 0
    step = 0
    while i < n:
        s = step % 16
        for hit, gen in ((pat_k[s], kick), (pat_s[s], snare), (pat_h[s], hat)):
            if hit:
                g = gen(rng) * rng.uniform(0.7, 1.0)
                j = min(n - i, len(g))
                y[i : i + j] += g[:j]
        i += spb
        step += 1
    return y


def melody_track(n, tempo, root, scale, rng, voice="pluck", octave=0):
    y = np.zeros(n + SR * 3)
    beat = SR * 60 / tempo
    degrees = SCALES[scale]
    deg = rng.integers(0, len(degrees))
    octv = 0
    i = 0
    while i < n:
        dur_beats = rng.choice([0.5, 0.5, 1.0, 1.0, 2.0, 4.0])
        if rng.random() < 0.12:  # rest
            i += int(dur_beats * beat)
            continue
        deg = int(np.clip(deg + rng.integers(-2, 3), -1, len(degrees)))
        if deg < 0:
            deg, octv = len(degrees) - 1, octv - 1
        elif deg >= len(degrees):
            deg, octv = 0, octv + 1
        octv = int(np.clip(octv, -1, 1))
        m = root + 12 * (octave + octv) + degrees[deg]
        f0 = float(midi_to_hz(m))
        dur = dur_beats * beat / SR * rng.uniform(0.9, 1.4)
        if voice == "pluck":
            g = pluck(f0, min(dur, 2.5), rng)
        elif voice == "fm":
            g = fm_tone(f0, min(dur, 2.5), rng)
        else:
            g = formant_voice(f0, min(dur, 2.0), rng)
        j = int(i)
        g = g[: len(y) - j]
        y[j : j + len(g)] += g * rng.uniform(0.5, 1.0)
        i += dur_beats * beat
    return y[:n]


def bass_track(n, tempo, root, scale, rng):
    y = np.zeros(n + SR * 3)
    beat = SR * 60 / tempo
    degrees = SCALES[scale]
    i = 0
    while i < n:
        deg = int(rng.choice([0, 0, 3 % len(degrees), 4 % len(degrees)]))
        m = root - 24 + degrees[deg]
        dur = rng.choice([1.0, 2.0]) * beat / SR
        g = pluck(float(midi_to_hz(m)), min(dur, 2.0), rng, bright=0.6)
        j = int(i)
        g = g[: len(y) - j]
        y[j : j + len(g)] += g
        i += dur * SR
    return y[:n]


def pad_track(n, tempo, root, scale, rng):
    y = np.zeros(n + SR * 4)
    beat = SR * 60 / tempo
    degrees = SCALES[scale]
    i = 0
    while i < n:
        deg = int(rng.integers(0, len(degrees)))
        triad = [degrees[deg], degrees[(deg + 2) % len(degrees)], degrees[(deg + 4) % len(degrees)]]
        freqs = [float(midi_to_hz(root + d + (12 if d < triad[0] else 0))) for d in triad]
        dur = rng.choice([4.0, 8.0]) * beat / SR
        g = pad_chord(freqs, min(dur + 0.5, 10.0), rng)
        j = int(i)
        g = g[: len(y) - j]
        y[j : j + len(g)] += g
        i += dur * SR
    return y[:n]


def texture_track(n, rng):
    noise = rng.standard_normal(n)
    lo = rng.uniform(0.002, 0.02)
    hi = lo + rng.uniform(0.01, 0.3)
    y = lfilter(*butter(2, [lo, min(hi, 0.95)], "band"), noise)
    t = np.arange(n) / SR
    lfo = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.02, 0.2) * t + rng.uniform(0, 6))
    return y * lfo


def room_reverb(y, rng):
    rt = rng.uniform(0.2, 1.4)
    n_ir = int(rt * SR)
    t = np.arange(n_ir) / SR
    ir = rng.standard_normal(n_ir) * np.exp(-3 * t / rt)
    ir = lfilter(*butter(1, rng.uniform(0.1, 0.4), "low"), ir)
    ir[0] = 1.0
    ir /= np.sqrt((ir**2).sum())
    wet = rng.uniform(0.05, 0.35)
    out = fftconvolve(y, ir)[: len(y)]
    return (1 - wet) * y + wet * out


def render_piece(rng, dur_s):
    n = int(dur_s * SR)
    tempo = rng.uniform(60, 160)
    root = int(rng.integers(48, 72))
    scale = rng.choice(list(SCALES))
    style = rng.choice(
        ["pluck_solo", "band", "fm_pad", "voice_pad", "drums", "drone", "mixed"],
        p=[0.15, 0.25, 0.15, 0.15, 0.1, 0.08, 0.12],
    )
    layers = []
    if style == "pluck_solo":
        layers.append((1.0, melody_track(n, tempo, root, scale, rng, "pluck")))
        if rng.random() < 0.5:
            layers.append((0.5, bass_track(n, tempo, root, scale, rng)))
    elif style == "band":
        layers.append((0.9, melody_track(n, tempo, root, scale, rng, rng.choice(["pluck", "fm"]))))
        layers.append((0.6, bass_track(n, tempo, root, scale, rng)))
        layers.append((0.55, drum_track(n, tempo, rng)))
        if rng.random() < 0.4:
            layers.append((0.3, pad_track(n, tempo, root, scale, rng)))
    elif style == "fm_pad":
        layers.append((0.8, melody_track(n, tempo, root, scale, rng, "fm")))
        layers.append((0.45, pad_track(n, tempo, root, scale, rng)))
    elif style == "voice_pad":
        layers.append((0.9, melody_track(n, tempo * 0.5, root + 12, scale, rng, "voice")))
        layers.append((0.4, pad_track(n, tempo, root, scale, rng)))
    elif style == "drums":
        layers.append((1.0, drum_track(n, tempo, rng)))
        if rng.random() < 0.5:
            layers.append((0.5, bass_track(n, tempo, root, scale, rng)))
    elif style == "drone":
        layers.append((0.8, pad_track(n, tempo, root, scale, rng)))
        layers.append((0.35, texture_track(n, rng)))
    else:  # mixed
        layers.append((0.8, melody_track(n, tempo, root, scale, rng, rng.choice(["pluck", "fm", "voice"]))))
        layers.append((0.5, drum_track(n, tempo, rng)))
        layers.append((0.35, texture_track(n, rng)))
    y = np.zeros(n)
    for g, tr in layers:
        y += g * rng.uniform(0.7, 1.2) * tr
    y = np.tanh(y * rng.uniform(0.8, 2.0))
    y = room_reverb(y, rng)
    peak_db = rng.uniform(1.0, 12.0)
    y = y / (np.abs(y).max() + 1e-9) * 10 ** (-peak_db / 20)
    return y.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--minutes", type=float, default=140.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min_dur", type=float, default=40.0)
    ap.add_argument("--max_dur", type=float, default=80.0)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    total = 0.0
    i = 0
    t0 = time.time()
    while total < args.minutes * 60:
        dur = rng.uniform(args.min_dur, args.max_dur)
        y = render_piece(rng, dur)
        wavfile.write(out / f"piece_{i:04d}.wav", SR, (y * 32767).astype(np.int16))
        total += len(y) / SR
        i += 1
        if i % 10 == 0:
            print(
                f"{i} pieces, {total/60:.1f} min audio, {time.time()-t0:.0f}s elapsed",
                flush=True,
            )
    print(f"done: {i} pieces, {total/60:.1f} minutes at {out}")


if __name__ == "__main__":
    main()
