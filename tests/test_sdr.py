"""BSS Eval v3 SDR (eval/bss.py) — first-party validation.

The reference's SDR is mir_eval.separation.bss_eval_sources on one
(ref, est) pair (audio_zen/metrics.py:56-58). No mir_eval wheel exists
in this image, so correctness is pinned the eval/pesq + STOI way:

  1. a deliberately-different dense construction of the same projection
     (explicit delay matrix + lstsq) cross-checked against the FFT/Toeplitz
     implementation on random signals;
  2. analytic sanity: any <512-tap filtering of the reference is invisible
     to SDR; additive noise bounds it near the SNR; scale invariance;
     monotonicity in noise level;
  3. a gated bit-parity test against the mir_eval wheel when importable.
"""
import numpy as np
import pytest

from generative_audio_tpu.eval.bss import (
    _project, _project_dense, bss_eval_sdr)
from generative_audio_tpu.eval.metrics import SDR


def _speechlike(rng, n):
    # low-passed noise with an envelope, so the Gram matrix is well away
    # from white-noise-identity and the projection is non-trivial
    x = rng.standard_normal(n)
    k = np.hanning(33)
    x = np.convolve(x, k / k.sum(), mode="same")
    return x * (0.3 + np.abs(np.sin(np.arange(n) / 800.0)))


@pytest.mark.parametrize("flen", [16, 64])
def test_fft_projection_matches_dense_literal(flen):
    rng = np.random.default_rng(0)
    ref = _speechlike(rng, 1500)
    est = _speechlike(rng, 1500) + 0.5 * ref
    p_fft = _project(ref, est, flen)
    p_dense = _project_dense(ref, est, flen)
    assert p_fft.shape == p_dense.shape == (1500 + flen - 1,)
    np.testing.assert_allclose(p_fft, p_dense, rtol=0, atol=1e-8)


def test_filtered_reference_is_transparent():
    # est = ref convolved with a 40-tap filter: inside the 512-tap
    # distortion-filter subspace, so the artifact residual is ~zero.
    # ref gets a silent tail so truncating the convolution at n loses
    # nothing (otherwise the cut tail leaves a genuine LS residual —
    # mir_eval behaves identically there). Broadband ref keeps the
    # Gram matrix well-conditioned.
    rng = np.random.default_rng(1)
    ref = rng.standard_normal(8000)
    ref[-600:] = 0.0
    h = rng.standard_normal(40) * np.hanning(40)
    est = np.convolve(ref, h, mode="full")[:8000]
    assert bss_eval_sdr(ref, est) > 80.0


def test_additive_noise_tracks_snr():
    rng = np.random.default_rng(2)
    ref = _speechlike(rng, 16000)
    for snr_db in (0.0, 10.0, 20.0):
        noise = rng.standard_normal(16000)
        noise *= np.linalg.norm(ref) / np.linalg.norm(noise) \
            * 10 ** (-snr_db / 20)
        sdr = bss_eval_sdr(ref, ref + noise)
        # the 512-tap projection absorbs part of the noise, so SDR >= SNR;
        # with n >> flen the overshoot stays small
        assert snr_db - 0.1 < sdr < snr_db + 2.0


def test_scale_invariance_and_monotonicity():
    rng = np.random.default_rng(3)
    ref = _speechlike(rng, 8000)
    noise = rng.standard_normal(8000)
    est = ref + 0.1 * noise
    a = bss_eval_sdr(ref, est)
    assert np.isclose(a, bss_eval_sdr(ref, 3.7 * est), atol=1e-9)
    b = bss_eval_sdr(ref, ref + 0.3 * noise)
    assert a > b


def test_input_validation():
    with pytest.raises(ValueError, match="mismatch"):
        bss_eval_sdr(np.ones(100), np.ones(101))
    with pytest.raises(ValueError, match="silent"):
        bss_eval_sdr(np.zeros(100), np.ones(100))


def test_registry_entry_computes():
    rng = np.random.default_rng(4)
    ref = _speechlike(rng, 8000)
    out = SDR(ref, ref + 0.05 * rng.standard_normal(8000))
    assert np.isfinite(out) and out > 10.0


@pytest.mark.gated
def test_parity_against_mir_eval_wheel():
    """Standing gate: the day a mir_eval wheel appears, pin against it."""
    mir = pytest.importorskip("mir_eval.separation")
    rng = np.random.default_rng(5)
    ref = _speechlike(rng, 16000)
    est = ref + 0.2 * rng.standard_normal(16000)
    theirs, _, _, _ = mir.bss_eval_sources(ref[None, :], est[None, :])
    np.testing.assert_allclose(bss_eval_sdr(ref, est), float(theirs),
                               rtol=0, atol=1e-6)
