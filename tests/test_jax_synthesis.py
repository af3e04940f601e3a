"""Device WORLD synthesis (dsp/world/jax_synthesis) vs the host path.

The host pulse loop (dsp/world/synthesis.py) is the parity anchor — these
tests pin the jittable reformulation to it: identical pulse tracks,
float32-tolerance waveforms on the deterministic (periodic) component,
matched noise envelopes on the stochastic one, and the WorldSynthesizer
jax backend end to end (frame bucketing + async dispatch).
"""

import numpy as np

from qpnet_tpu.dsp.world.jax_synthesis import jax_synthesize, pulse_times_debug
from qpnet_tpu.dsp.world.synthesis import _pulse_times, synthesize

FS = 22050
SHIFTMS = 5.0


def _f0_track(F, voiced_gap=True):
    """Vibrato F0 with an unvoiced gap in the middle."""
    t = np.arange(F) * SHIFTMS / 1000.0
    f0 = 150.0 * (1 + 0.08 * np.sin(2 * np.pi * 3.0 * t))
    if voiced_gap:
        f0[F // 3: F // 2] = 0.0
    return f0


def _envelope(F, half=513):
    """Smooth formant-ish per-frame power envelope (int16-scale power)."""
    freqs = np.linspace(0, FS / 2, half)
    base = (1e6 / (1 + ((freqs - 800) / 600) ** 2)
            + 3e5 / (1 + ((freqs - 2400) / 400) ** 2) + 10.0)
    drift = 1.0 + 0.3 * np.sin(np.linspace(0, 3.0, F))
    return base[None, :] * drift[:, None]


class TestPulseTimes:
    def test_matches_host_on_mixed_track(self):
        F = 100
        f0 = _f0_track(F)
        time_axis = np.arange(F) * SHIFTMS / 1000.0
        n = int(F * SHIFTMS / 1000.0 * FS)
        idx_h, shift_h, voiced_h = _pulse_times(f0, time_axis, FS, n)
        idx_j, shift_j, voiced_j = pulse_times_debug(f0, FS, SHIFTMS)
        assert len(idx_j) == len(idx_h)
        # float32 cumulative phase may flip an isolated crossing by one
        # sample; everything else must be exact
        d = np.abs(idx_j.astype(int) - idx_h.astype(int))
        assert d.max() <= 1 and (d == 0).mean() > 0.95, d
        same = d == 0
        np.testing.assert_allclose(shift_j[same], shift_h[same],
                                   atol=1e-2 / FS)   # 0.01-sample precision
        assert (voiced_j[same] == voiced_h[same]).all()

    def test_prepends_origin_pulse(self):
        # constant voiced track: first wrap falls one period in, so both
        # paths must prepend the t=0 pulse
        f0 = np.full(40, 120.0)
        idx_j, shift_j, _ = pulse_times_debug(f0, FS, SHIFTMS)
        assert idx_j[0] == 0 and shift_j[0] == 0.0
        gaps = np.diff(idx_j[1:])
        assert np.all(np.abs(gaps - FS / 120.0) < 2)


class TestWaveformParity:
    def test_periodic_component_matches_host(self):
        """With aperiodicity ~0 the synthesis is deterministic: the device
        waveform must match the float64 host loop to f32 tolerance."""
        F = 100
        f0 = _f0_track(F, voiced_gap=False)
        sp = _envelope(F)
        ap = np.full_like(sp, 1e-6)
        y_h = synthesize(f0, sp, ap, FS, frame_period=SHIFTMS, seed=0)
        y_j = np.asarray(jax_synthesize(f0, sp, ap, np.uint32(0), FS,
                                        frame_period=SHIFTMS))
        assert y_j.shape == y_h.shape
        rms = np.sqrt(np.mean(y_h ** 2))
        corr = np.corrcoef(y_h, y_j)[0, 1]
        assert corr > 0.999, corr
        assert np.sqrt(np.mean((y_h - y_j) ** 2)) < 5e-3 * rms

    def test_noise_envelope_matches_host(self):
        """Unvoiced synthesis is filtered noise: different RNGs, same
        filter — band energies must agree within ~2 dB."""
        F = 200
        f0 = np.zeros(F)
        sp = _envelope(F)
        ap = np.full_like(sp, 0.999999)
        y_h = synthesize(f0, sp, ap, FS, frame_period=SHIFTMS, seed=3)
        y_j = np.asarray(jax_synthesize(f0, sp, ap, np.uint32(3), FS,
                                        frame_period=SHIFTMS))
        Sh = np.abs(np.fft.rfft(y_h)) ** 2
        Sj = np.abs(np.fft.rfft(y_j)) ** 2
        edges = np.linspace(0, len(Sh), 6).astype(int)
        for a, b in zip(edges[:-1], edges[1:]):
            ratio_db = 10 * np.log10(Sj[a:b].sum() / Sh[a:b].sum())
            assert abs(ratio_db) < 2.0, ratio_db

    def test_deterministic_per_seed(self):
        F = 60
        f0 = _f0_track(F)
        sp = _envelope(F)
        ap = np.full_like(sp, 0.3)
        a = np.asarray(jax_synthesize(f0, sp, ap, np.uint32(7), FS,
                                      frame_period=SHIFTMS))
        b = np.asarray(jax_synthesize(f0, sp, ap, np.uint32(7), FS,
                                      frame_period=SHIFTMS))
        c = np.asarray(jax_synthesize(f0, sp, ap, np.uint32(8), FS,
                                      frame_period=SHIFTMS))
        np.testing.assert_array_equal(a, b)
        assert np.abs(a - c).max() > 0


class TestSynthesizerBackend:
    def test_jax_backend_matches_host_mcd(self):
        """WorldSynthesizer(backend='jax'): same mcep/ap conditioning
        through the device path must land at the host path's quality
        (copy-synthesis of a deterministic periodic signal)."""
        from qpnet_tpu.dsp.mcep import sp2mc
        from qpnet_tpu.dsp.world.api import WorldSynthesizer
        from qpnet_tpu.tools.evaluate import wav_metrics

        F = 201                                   # forces frame padding
        f0 = _f0_track(F, voiced_gap=False)
        sp = _envelope(F)
        ap = np.full_like(sp, 1e-6)
        mcep = sp2mc(sp, 34, 0.455)
        host = WorldSynthesizer(fs=FS, fftl=1024, shiftms=SHIFTMS)
        dev = WorldSynthesizer(fs=FS, fftl=1024, shiftms=SHIFTMS,
                               backend="jax")
        y_h = host.synthesis(f0, mcep, ap, 0.455)
        y_j = dev.synthesis(f0, mcep, ap, 0.455)
        assert len(y_j) == len(y_h)
        m = wav_metrics(y_h, y_j, FS, minf0=60, maxf0=400)
        assert m["mcd_db"] < 0.1, m
        assert m["f0_rmse_hz"] < 1.0, m

    def test_async_pipelining_matches_sync(self):
        from qpnet_tpu.dsp.mcep import sp2mc
        from qpnet_tpu.dsp.world.api import WorldSynthesizer

        F = 80
        f0 = _f0_track(F)
        sp = _envelope(F)
        ap = np.full_like(sp, 0.2)
        mcep = sp2mc(sp, 34, 0.455)
        dev = WorldSynthesizer(fs=FS, fftl=1024, shiftms=SHIFTMS,
                               backend="jax")
        handles = [dev.synthesis_async(f0, mcep, ap, 0.455)
                   for _ in range(3)]
        outs = [dev.synthesis_fetch(h) for h in handles]
        direct = dev.synthesis(f0, mcep, ap, 0.455)
        for o in outs:
            np.testing.assert_array_equal(o, direct)


class TestJaxRestore:
    def test_fused_decode_matches_host_decode(self):
        """jax_restore (device mc2sp + aperiodicity decode + synthesis)
        vs jax_synthesize fed the HOST-decoded spectra, same seed/PRNG:
        identical construction, so the waveforms must agree to f32
        tolerance — this pins the on-device decoding stages exactly."""
        from qpnet_tpu.dsp.mcep import mc2sp, sp2mc
        from qpnet_tpu.dsp.world.codec import (
            code_aperiodicity, decode_aperiodicity,
        )
        from qpnet_tpu.dsp.world.jax_synthesis import jax_restore

        F = 100
        f0 = _f0_track(F)
        sp = _envelope(F)
        mcep = sp2mc(sp, 34, 0.455)
        codeap = code_aperiodicity(np.full_like(sp, 0.3), FS)
        sp_dec = mc2sp(mcep, 0.455, 1024)
        ap_dec = decode_aperiodicity(codeap, FS, 1024)
        y_ref = np.asarray(jax_synthesize(
            f0, sp_dec, ap_dec, np.uint32(5), FS, frame_period=SHIFTMS))
        y_fused = np.asarray(jax_restore(
            f0.astype(np.float32), mcep.astype(np.float32),
            codeap.astype(np.float32), np.float32(0.455), np.uint32(5),
            FS, fftl=1024, frame_period=SHIFTMS))
        rms = np.sqrt(np.mean(y_ref ** 2))
        assert np.sqrt(np.mean((y_ref - y_fused) ** 2)) < 2e-3 * rms


class TestRestoreWorker:
    def test_cli_restore_device_matches_host(self, tmp_path):
        """feature_extract --inv false --dsp_backend jax renders the same
        audio (same conditioning, device construction) as the host pass."""
        from scipy.io import wavfile

        from qpnet_tpu.bin.feature_extract import main as fe_main
        from qpnet_tpu.data import write_hdf5
        from qpnet_tpu.dsp.world.codec import code_aperiodicity
        from qpnet_tpu.dsp.mcep import sp2mc
        from qpnet_tpu.tools.evaluate import wav_metrics

        F = 120
        f0 = _f0_track(F, voiced_gap=False)
        sp = _envelope(F)
        ap = np.full_like(sp, 1e-6)
        mcep = sp2mc(sp, 34, 0.455)
        uv = (f0 > 0).astype(np.float32)
        codeap = code_aperiodicity(ap, FS)
        world = np.concatenate(
            [uv[:, None], f0[:, None], mcep, codeap], axis=1)

        for mode in ("host", "jax"):
            d = tmp_path / mode / "wav"
            d.mkdir(parents=True)
            n = int(F * SHIFTMS / 1000.0 * FS)
            wavfile.write(str(d / "u1.wav"), FS,
                          np.zeros(n, np.int16))     # source placeholder
            feat = str(tmp_path / mode / "h5" / "u1.h5")
            write_hdf5(feat, "/world", world.astype(np.float32))
            write_hdf5(feat, "/f0", f0)
            lst = tmp_path / mode / "list.txt"
            lst.write_text(str(d / "u1.wav") + "\n")
            fe_main(["--waveforms", str(lst), "--inv", "false",
                     "--fs", str(FS), "--shiftms", str(SHIFTMS),
                     "--mcep_dim_start", "2", "--mcep_dim_end", "37",
                     "--mcep_alpha", "0.455", "--n_jobs", "1",
                     "--dsp_backend", "jax" if mode == "jax" else "numpy"])
            out = tmp_path / mode / "h5_restored" / "u1.wav"
            assert out.exists(), list((tmp_path / mode).rglob("*"))

        fs_h, y_h = wavfile.read(str(tmp_path / "host" / "h5_restored" / "u1.wav"))
        fs_j, y_j = wavfile.read(str(tmp_path / "jax" / "h5_restored" / "u1.wav"))
        assert fs_h == fs_j == FS and len(y_h) == len(y_j)
        m = wav_metrics(np.asarray(y_h, np.float64),
                        np.asarray(y_j, np.float64), FS, minf0=60, maxf0=400)
        # the decoded aperiodicity's Nyquist anchor is ~0 dB (codec
        # contract), so both renders carry real high-band noise from
        # DIFFERENT RNGs — the comparison floor is the host path against
        # itself at another seed, not zero
        from qpnet_tpu.dsp.mcep import mc2sp
        from qpnet_tpu.dsp.world.codec import decode_aperiodicity
        from qpnet_tpu.dsp.world.synthesis import synthesize as _synth
        sp_dec = mc2sp(mcep, 0.455, 1024)
        ap_dec = decode_aperiodicity(codeap, FS, 1024)
        ya = _synth(f0, sp_dec, ap_dec, FS, frame_period=SHIFTMS, seed=1)
        yb = _synth(f0, sp_dec, ap_dec, FS, frame_period=SHIFTMS, seed=2)
        floor = wav_metrics(ya, yb, FS, minf0=60, maxf0=400)
        assert m["mcd_db"] <= floor["mcd_db"] + 0.1, (m, floor)
        assert m["f0_rmse_hz"] < 1.0, m
