"""WORLD analysis/synthesis validation on synthetic signals with known
ground truth (the reference has no tests; SURVEY.md §4 golden strategy)."""

import numpy as np
import pytest

from qpnet_tpu.dsp.world import (
    WorldAnalyzer, WorldSynthesizer, cheaptrick, code_aperiodicity,
    d4c, decode_aperiodicity, dio, stonemask, synthesize,
)
from qpnet_tpu.dsp.world.codec import n_aperiodicity_bands

FS = 16000


def sawtooth(f0_hz, seconds, fs=FS, f0_end=None):
    n = int(seconds * fs)
    f0_end = f0_end or f0_hz
    f0_t = np.linspace(f0_hz, f0_end, n)
    phase = np.cumsum(f0_t / fs)
    x = 2 * (phase % 1.0) - 1.0
    return x * 8000.0  # int16-ish scale like the reference pipeline


def harmonic_tone(f0_hz, seconds, fs=FS, n_harm=10, decay=0.7):
    n = int(seconds * fs)
    t = np.arange(n) / fs
    x = sum((decay ** k) * np.sin(2 * np.pi * f0_hz * (k + 1) * t)
            for k in range(n_harm))
    return x * 4000.0


class TestDio:
    def test_constant_pitch(self):
        x = sawtooth(120.0, 0.6)
        f0, t = dio(x, FS, f0_floor=60, f0_ceil=400)
        voiced = f0 > 0
        assert voiced.mean() > 0.7
        med = np.median(f0[voiced])
        assert abs(med - 120.0) / 120.0 < 0.03, med

    def test_gliding_pitch(self):
        x = sawtooth(100.0, 0.8, f0_end=200.0)
        f0, t = dio(x, FS, f0_floor=60, f0_ceil=400)
        voiced = f0 > 0
        assert voiced.mean() > 0.6
        # track should rise
        idx = np.where(voiced)[0]
        first = f0[idx[: len(idx) // 4]].mean()
        last = f0[idx[-len(idx) // 4:]].mean()
        assert last > first * 1.5

    def test_silence_is_unvoiced(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=FS // 2) * 1.0  # near-silent noise
        f0, t = dio(x, FS, f0_floor=60, f0_ceil=400)
        assert (f0 > 0).mean() < 0.3

    def test_frame_count_convention(self):
        x = np.zeros(FS)  # 1 s
        f0, t = dio(x, FS, frame_period=5.0)
        assert len(f0) == int(FS / (FS * 0.005)) + 1 == 201


class TestStoneMask:
    def test_refines_toward_truth(self):
        x = harmonic_tone(137.0, 0.6)
        f0, t = dio(x, FS, f0_floor=60, f0_ceil=400)
        f0r = stonemask(x, f0, t, FS)
        voiced = f0r > 0
        assert voiced.mean() > 0.6
        err = np.abs(f0r[voiced] - 137.0) / 137.0
        assert np.median(err) < 0.01, np.median(err)


class TestCheapTrick:
    def test_envelope_peaks_at_formant(self):
        """Harmonic tone with a strong spectral peak at a 'formant'."""
        n = int(0.5 * FS)
        t = np.arange(n) / FS
        f0 = 125.0
        # harmonics near 2 kHz boosted
        x = sum(np.exp(-0.5 * ((k * f0 - 2000) / 400) ** 2 + 1)
                * np.sin(2 * np.pi * k * f0 * t)
                for k in range(1, 60))
        x *= 1000.0
        f0_track = np.full(int(n / (FS * 0.005)) + 1, f0)
        ta = np.arange(len(f0_track)) * 0.005
        sp = cheaptrick(x, f0_track, ta, FS, fft_size=1024)
        mean_sp = sp[5:-5].mean(axis=0)
        freqs = np.linspace(0, FS / 2, len(mean_sp))
        peak_freq = freqs[np.argmax(mean_sp)]
        assert 1500 < peak_freq < 2500, peak_freq

    def test_flat_for_white_noise(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=FS // 2) * 1000
        F = int(len(x) / (FS * 0.005)) + 1
        f0_track = np.zeros(F)
        ta = np.arange(F) * 0.005
        sp = cheaptrick(x, f0_track, ta, FS, fft_size=1024)
        db = 10 * np.log10(sp[5:-5].mean(axis=0))
        assert db[20:-20].std() < 3.0


class TestD4C:
    def test_harmonic_vs_noise(self):
        f0_val = 140.0
        x_h = harmonic_tone(f0_val, 0.5, n_harm=40, decay=0.95)
        rng = np.random.default_rng(2)
        x_n = rng.normal(size=len(x_h)) * 2000
        F = int(len(x_h) / (FS * 0.005)) + 1
        ta = np.arange(F) * 0.005
        f0 = np.full(F, f0_val)
        ap_h = d4c(x_h, f0, ta, FS, fft_size=1024)
        ap_n = d4c(x_n, f0, ta, FS, fft_size=1024)
        assert ap_h[5:-5].mean() < 0.35, ap_h.mean()
        assert ap_n[5:-5].mean() > 0.6, ap_n.mean()


class TestCodec:
    def test_band_count_matches_reference_dims(self):
        # param_feat.py:38-52 — 22050: 2 codeap dims; 24000: 3; 16000: 1
        assert n_aperiodicity_bands(22050) == 2
        assert n_aperiodicity_bands(24000) == 3
        assert n_aperiodicity_bands(16000) == 1

    def test_code_decode_round_trip(self):
        rng = np.random.default_rng(3)
        F, half = 4, 513
        fs = 22050
        # piecewise-linear-in-dB aperiodicity is exactly representable
        coded = rng.uniform(-40, -5, size=(F, n_aperiodicity_bands(fs)))
        ap = decode_aperiodicity(coded, fs, 1024)
        coded2 = code_aperiodicity(ap, fs)
        np.testing.assert_allclose(coded2, coded, atol=0.75)


class TestSynthesis:
    def test_round_trip_f0(self):
        """analysis -> synthesis -> re-analysis preserves the F0 track."""
        x = sawtooth(150.0, 0.6)
        an = WorldAnalyzer(fs=FS, minf0=60, maxf0=400, fftl=1024)
        f0, sp, ap = an.analyze(x)
        y = synthesize(f0, sp, ap, FS, frame_period=5.0)
        f0y, ty = dio(y, FS, f0_floor=60, f0_ceil=400)
        voiced = (f0 > 0) & (f0y[: len(f0)] > 0)
        assert voiced.mean() > 0.5
        rel = np.abs(f0y[: len(f0)][voiced] - f0[voiced]) / f0[voiced]
        assert np.median(rel) < 0.05, np.median(rel)

    def test_round_trip_energy(self):
        x = sawtooth(150.0, 0.5)
        an = WorldAnalyzer(fs=FS, minf0=60, maxf0=400, fftl=1024)
        f0, sp, ap = an.analyze(x)
        y = synthesize(f0, sp, ap, FS, frame_period=5.0)
        mid = slice(len(y) // 4, 3 * len(y) // 4)
        ratio = np.std(y[mid]) / np.std(x[mid])
        assert 0.3 < ratio < 3.0, ratio

    def test_full_pipeline_mcep_domain(self):
        """mcep-coded envelope + coded ap (the h5 feature contract) still
        resynthesizes with the right pitch."""
        x = sawtooth(170.0, 0.6)
        an = WorldAnalyzer(fs=FS, minf0=60, maxf0=400, fftl=1024)
        f0, sp, ap = an.analyze(x)
        mcep = an.mcep(dim=24, alpha=0.41)
        codeap = an.codeap()
        ap2 = decode_aperiodicity(codeap, FS, 1024)
        syn = WorldSynthesizer(fs=FS, fftl=1024, shiftms=5.0)
        y = syn.synthesis(f0, mcep, ap2, alpha=0.41)
        f0y, _ = dio(y, FS, f0_floor=60, f0_ceil=400)
        voiced = (f0 > 0) & (f0y[: len(f0)] > 0)
        assert voiced.mean() > 0.5
        rel = np.abs(f0y[: len(f0)][voiced] - f0[voiced]) / f0[voiced]
        assert np.median(rel) < 0.05


class TestHarvest:
    def test_constant_and_gliding_pitch(self):
        from qpnet_tpu.dsp.world import harvest
        for a, b in [(120.0, 120.0), (100.0, 200.0), (70.0, 70.0)]:
            x = sawtooth(a, 0.6, f0_end=b)
            f0, ta = harvest(x, FS, f0_floor=60, f0_ceil=400)
            v = f0 > 0
            assert v.mean() > 0.9, (a, b, v.mean())
            truth = np.linspace(a, b, len(f0))
            err = np.abs(f0[v] - truth[v]) / truth[v]
            assert np.median(err) < 0.01, (a, b, np.median(err))

    def test_noise_mostly_unvoiced(self):
        from qpnet_tpu.dsp.world import harvest
        rng = np.random.default_rng(5)
        f0, _ = harvest(rng.normal(size=FS // 2), FS,
                        f0_floor=60, f0_ceil=400)
        assert (f0 > 0).mean() < 0.35

    def test_analyzer_selection(self):
        x = sawtooth(150.0, 0.5)
        for analyzer in ("harvest", "dio"):
            an = WorldAnalyzer(fs=FS, minf0=60, maxf0=400, fftl=1024,
                               f0_analyzer=analyzer)
            f0, sp, ap = an.analyze(x)
            v = f0 > 0
            assert v.mean() > 0.5, analyzer
            assert abs(np.median(f0[v]) - 150.0) < 6.0, analyzer
