"""Native PESQ (eval/pesq_native.py) behavior pins + ITU A/B when available.

The calibration anchors inside the module were fitted on a seed-0 AWGN
experiment; these tests deliberately use different seeds and a different
synthetic voice so they check generalization, not the fit itself.
"""

import numpy as np
import pytest

from simwhisper_codec_tpu.eval import metrics as M
from simwhisper_codec_tpu.eval.pesq_native import pesq, pesq_raw


def make_voice(seconds=3.0, sr=16000, seed=7, f_base=95.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    f0 = f_base + 25 * np.sin(2 * np.pi * 1.7 * t)
    sig = sum(np.sin(2 * np.pi * h * np.cumsum(f0) / sr + rng.uniform(0, 6)) / h ** 0.5
              for h in range(1, 40))  # bright spectrum: real content past 4 kHz
    # speech-like gating with true pauses — PESQ's additive-noise penalty
    # comes largely from noise audible in the gaps
    env = np.clip(np.sin(2 * np.pi * 2.2 * t) - 0.3, 0, None) ** 2 * 2.0
    return (sig * env * 0.08).astype(np.float64)


def test_clean_signal_hits_ceiling():
    x = make_voice()
    assert pesq(16000, x, x) > 4.55          # P.862.2 max ~4.64
    assert pesq(16000, x, x, "nb") > 4.4


def test_monotonic_in_noise_level():
    x = make_voice(seed=11, f_base=130.0)
    rng = np.random.default_rng(99)
    noise = rng.standard_normal(len(x))
    prev_wb, prev_nb = 5.0, 5.0
    for snr in (35, 25, 15, 5):
        n = noise * np.std(x) * 10 ** (-snr / 20)
        wb = pesq(16000, x, x + n)
        nb = pesq(16000, x, x + n, "nb")
        assert wb < prev_wb - 0.1 and nb < prev_nb - 0.1, (snr, wb, nb)
        prev_wb, prev_nb = wb, nb
    assert prev_wb < 2.2  # 5 dB SNR is bad


def test_plausible_absolute_scale():
    """25 dB AWGN should land mid-scale (the region the baseline occupies)."""
    x = make_voice(seed=3)
    rng = np.random.default_rng(123)
    n = rng.standard_normal(len(x)) * np.std(x) * 10 ** (-25 / 20)
    wb = pesq(16000, x, x + n)
    assert 2.4 < wb < 3.9, wb


def test_wb_penalizes_lowpass_nb_does_not():
    """Wideband mode must punish 3.5 kHz band-limiting; narrowband barely."""
    x = make_voice(seed=5)
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1 / 16000)
    Xl = X.copy()
    Xl[f > 3500] = 0
    y = np.fft.irfft(Xl, len(x))
    wb_lp, nb_lp = pesq(16000, x, y), pesq(16000, x, y, "nb")
    assert wb_lp < 4.2
    assert nb_lp > wb_lp - 0.2  # NB mode is indifferent to >4k content


def test_constant_delay_compensated():
    x = make_voice(seed=13)
    shift = 800  # 50 ms
    delayed = np.concatenate([np.zeros(shift), x])[: len(x)]
    aligned = pesq(16000, x, delayed)
    assert aligned > 3.5  # would be catastrophic without alignment
    raw_identity = pesq_raw(x, x, 16000)
    assert raw_identity == pytest.approx(4.5, abs=1e-6)


def test_metrics_pesq_score_never_none():
    x = make_voice(seconds=1.5).astype(np.float32)
    wb = M.pesq_score(x, x, 16000, "wb")
    nb = M.pesq_score(x, x, 16000, "nb")
    assert wb is not None and wb > 4.5
    assert nb is not None and nb > 4.3


def test_matches_itu_pesq_if_available():
    """Tolerance A/B vs the ITU reference wrapper (runs where pip pesq exists).

    Documented tolerance: |native - ITU| <= 0.35 MOS on speech+AWGN pairs in
    [1.3, 4.3]; the native implementation uses formula-derived tables (see
    module docstring) so it tracks, not equals, the reference C scores.
    """
    ituq = pytest.importorskip("pesq")
    x = make_voice(seed=21)
    rng = np.random.default_rng(4)
    noise = rng.standard_normal(len(x))
    worst = 0.0
    for snr in (35, 25, 15, 5):
        n = noise * np.std(x) * 10 ** (-snr / 20)
        for mode in ("wb", "nb"):
            rate = 16000 if mode == "wb" else 8000
            from simwhisper_codec_tpu.utils.audio_io import resample
            ref = resample(x.astype(np.float32), 16000, rate).astype(np.float64)
            deg = resample((x + n).astype(np.float32), 16000, rate).astype(np.float64)
            want = ituq.pesq(rate, ref, deg, mode)
            got = pesq(rate, ref, deg, mode)
            worst = max(worst, abs(want - got))
    assert worst <= 0.35, worst


class TestConformanceSuite:
    """Deterministic conformance suite (tools/pesq_conformance.py): native
    sanity pinned everywhere; the ITU A/B bound enforced wherever pip pesq
    exists (docs/PESQ_CONFORMANCE.json records the recorded halves)."""

    @pytest.fixture(scope="class")
    def suite(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        import pesq_conformance as pc

        # one carrier keeps the suite fast in the core tier
        carriers = pc.load_carriers()
        name, x = next(iter(carriers.items()))
        return pc, [(f"{name}/{d}", x, y) for d, y in pc.degradations(x, 16000).items()]

    def test_native_sanity(self, suite):
        pc, pairs = suite
        scores = {pid.split("/", 1)[1]: pesq(16000, ref, deg, "wb")
                  for pid, ref, deg in pairs}
        assert scores["identity"] > 4.5
        snr = [scores[f"awgn_{s}dB"] for s in (40, 30, 20, 10, 5)]
        assert all(a > b for a, b in zip(snr, snr[1:])), snr
        q = [scores[f"quant_{b}bit"] for b in (8, 5, 3)]
        assert all(a > b for a, b in zip(q, q[1:])), q
        # level shifts and small constant delay are compensated by P.862
        assert abs(scores["level_-10dB"] - scores["identity"]) < 0.05
        assert abs(scores["delay_8ms"] - scores["identity"]) < 0.1

    def test_vs_itu_bound(self, suite):
        """|native - ITU| bound over the degradation suite (target <= 0.35
        max / <= 0.15 median on these families; the formula-derived tables
        track, not equal, the ITU C scores — module docstring)."""
        pytest.importorskip("pesq")
        pc, pairs = suite
        report = pc.score_suite(pairs)
        dev = report["deviation"]["wb"]
        assert dev["max_abs_dev"] <= 0.35, dev
        assert dev["median_abs_dev"] <= 0.15, dev
        assert dev["spearman"] >= 0.95, dev
