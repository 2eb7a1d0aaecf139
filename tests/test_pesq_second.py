"""Cross-implementation grounding of the from-scratch PESQ (VERDICT round-3
item 1): the production vectorized pipeline (eval/pesq/) against the
deliberately-different literal transcription in tests/pesq_literal.py —
the same two-transcription pattern that grounds STOI
(test_stoi_golden.py:_stoi_literal).

58 randomized fixtures sweep the degradations the standard is sensitive
to: identity, white and pink noise at 0-40 dB SNR, bulk delay, low-pass
filtering, hard clipping, static gain — in both WB (16 kHz, P.862.2) and
NB (8 kHz, P.862.1) modes.  The committed bound
tests/golden/pesq_second_bound.json pins the max |MOS-LQO| disagreement
(observed ~1e-11: both transcriptions implement the same derived model,
so only float-associativity separates them; any constant typo or
off-by-one in either shows up orders of magnitude above the bound).

The independently-derived band tables are also compared directly: the
FFT-bin-to-Bark-band assignment must agree bin-for-bin, centre
frequencies and hearing thresholds to float tolerance.

Reference behaviour being grounded: the `pesq` wheel the reference calls
at audio_zen/metrics.py:92-116.
"""
import json
from pathlib import Path

import numpy as np
import pytest
from scipy.signal import butter, sosfilt

from generative_audio_tpu.eval.pesq import pesq
from generative_audio_tpu.eval.pesq.tables import band_table

from pesq_literal import build_tables, pesq_literal
from test_pesq import _speech_like

BOUND_FILE = Path(__file__).parent / "golden" / "pesq_second_bound.json"


# ------------------------------------------------------------------ tables
@pytest.mark.parametrize("fs", [8000, 16000])
def test_independent_table_derivations_agree(fs):
    prod = band_table(fs)
    lit = build_tables(fs)
    assert list(prod.bin_band) == lit["bin_band"]
    assert list(prod.bins_per_band) == lit["bins_per_band"]
    np.testing.assert_allclose(prod.centre_bark, lit["centre_bark"],
                               rtol=1e-9)
    np.testing.assert_allclose(prod.width_bark, lit["width_bark"],
                               rtol=1e-9)
    np.testing.assert_allclose(prod.centre_hz, lit["centre_hz"], atol=1e-5)
    np.testing.assert_allclose(prod.abs_thresh_power, lit["abs_thresh"],
                               rtol=1e-8)


# ---------------------------------------------------------------- fixtures
def _colored_noise(rng, n, alpha):
    """1/f^alpha noise (alpha 0 = white, 1 = pink)."""
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n)
    f[0] = f[1]
    return np.fft.irfft(spec / f ** (alpha / 2), n)


def _at_snr(x, noise, snr_db):
    noise = noise * np.sqrt(np.mean(x ** 2) / np.mean(noise ** 2)
                            / 10 ** (snr_db / 10))
    return x + noise


def _fixtures():
    """58 (name, fs, ref, deg, mode) cases."""
    cases = []
    for i, seed in enumerate(range(7)):          # 7 x 6 = 42 WB cases
        fs = 16000
        x = _speech_like(seed, seconds=3.0, fs=fs)
        rng = np.random.default_rng(1000 + seed)
        white = rng.standard_normal(len(x))
        pink = _colored_noise(rng, len(x), 1.0)
        snr_a = (0, 5, 10, 20, 30, 40)[i % 6]
        snr_b = (40, 30, 20, 10, 5, 0)[i % 6]
        delay = (160, 320, 640)[i % 3]
        sos = butter(4, (2000, 3000, 4000)[i % 3], "low", fs=fs,
                     output="sos")
        clip_at = (0.2, 0.35, 0.5)[i % 3] * np.max(np.abs(x))
        cases += [
            (f"wb{seed}_clean", fs, x, x.copy() * (0.5 + 0.2 * i), "wb"),
            (f"wb{seed}_white{snr_a}", fs, x, _at_snr(x, white, snr_a),
             "wb"),
            (f"wb{seed}_pink{snr_b}", fs, x, _at_snr(x, pink, snr_b),
             "wb"),
            (f"wb{seed}_delay", fs, x,
             np.concatenate([np.zeros(delay),
                             _at_snr(x, white, 25)])[: len(x)], "wb"),
            (f"wb{seed}_lowpass", fs, x, sosfilt(sos, x), "wb"),
            (f"wb{seed}_clip", fs, x, np.clip(x, -clip_at, clip_at),
             "wb"),
        ]
    for i, seed in enumerate(range(100, 104)):   # 4 x 4 = 16 NB cases
        fs = 8000
        x = _speech_like(seed, seconds=3.0, fs=fs)
        rng = np.random.default_rng(seed)
        white = rng.standard_normal(len(x))
        pink = _colored_noise(rng, len(x), 1.0)
        snr = (0, 10, 20, 40)[i]
        cases += [
            (f"nb{seed}_clean", fs, x, x.copy(), "nb"),
            (f"nb{seed}_white{snr}", fs, x, _at_snr(x, white, snr), "nb"),
            (f"nb{seed}_pink{snr}", fs, x, _at_snr(x, pink, snr), "nb"),
            (f"nb{seed}_clip", fs, x,
             np.clip(x, -0.3 * np.max(np.abs(x)),
                     0.3 * np.max(np.abs(x))), "nb"),
        ]
    return cases


def test_fixture_count_matches_committed_bound():
    bound = json.loads(BOUND_FILE.read_text())
    assert len(_fixtures()) == bound["n_fixtures"]


def test_production_matches_literal_transcription_on_fixture_sweep():
    bound = json.loads(BOUND_FILE.read_text())["max_abs_delta_bound"]
    worst = ("", 0.0)
    for name, fs, ref, deg, mode in _fixtures():
        got = pesq(fs, ref, deg, mode)
        lit = pesq_literal(fs, ref, deg, mode)
        delta = abs(got - lit)
        if delta > worst[1]:
            worst = (name, delta)
        assert delta <= bound, (name, got, lit)
    # the bound must stay tight: a "pass" at 100x the observed spread
    # would hide a real transcription divergence
    assert worst[1] <= bound, worst


if __name__ == "__main__":   # report the observed spread
    deltas = {}
    for name, fs, ref, deg, mode in _fixtures():
        deltas[name] = abs(pesq(fs, ref, deg, mode)
                           - pesq_literal(fs, ref, deg, mode))
    print(json.dumps({k: f"{v:.3e}" for k, v in deltas.items()}, indent=2))
    print("max:", max(deltas.values()))
