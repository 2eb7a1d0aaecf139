"""Conv-STFT, multichannel directional features, beamforming ops,
complex sequence model, and attention-variant parity tests.

Reference: audio_zen/acoustics/feature.py:288-630, beamforming.py,
sequence_model.py:126-243, attention_model.py:101-293.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from generative_audio_tpu.ops.conv_stft import (
    conv_stft_kernel, conv_stft, conv_istft)
from generative_audio_tpu.ops.multichannel import (
    ChannelWiseLayerNorm, DirectionalFeatureComputer,
    ChannelDirectionalFeatureComputer, compute_ipd)
from generative_audio_tpu.ops import beamforming as bf
from generative_audio_tpu.nn.recurrent import ComplexSequenceModel
from generative_audio_tpu.nn.attention import (
    ChannelTimeSenseSEWeightLayer, ChannelDeepTimeSenseSELayer,
    ChannelTimeSenseAttentionSELayer, SelfAttentionLayer)
from generative_audio_tpu.utils.torch_convert import (
    convert_complex_sequence_model, convert_deep_tsse, convert_attention_tsse,
    convert_self_attention, convert_tsse)
from tests.reference_loader import load_reference


# ---------------------------------------------------------------------------
# Conv-kernel STFT
# ---------------------------------------------------------------------------
class TestConvSTFT:
    def test_matches_dft_definition(self):
        """The conv kernel must equal windowed DFT rows / S (feature.py:288)."""
        L, hop, n = 32, 16, 32
        x = np.random.default_rng(0).standard_normal((2, 200)) \
            .astype(np.float32)
        mag, phase, real, imag = conv_stft(jnp.asarray(x), L, hop, n)
        # direct numpy: frame, window, rfft / S
        w = np.sqrt(np.hanning(L + 1)[:-1])
        S = 0.5 * (n * n / hop) ** 0.5
        n_frames = (200 - L) // hop + 1
        want_r = np.zeros((2, n // 2 + 1, n_frames))
        want_i = np.zeros_like(want_r)
        for t in range(n_frames):
            seg = x[:, t * hop:t * hop + L] * w / S
            spec = np.fft.rfft(seg, n=n)
            want_r[:, :, t] = spec.real
            want_i[:, :, t] = spec.imag
        np.testing.assert_allclose(np.asarray(real), want_r, atol=1e-4)
        np.testing.assert_allclose(np.asarray(imag), want_i, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mag), np.hypot(want_r, want_i), atol=1e-4)

    def test_perfect_reconstruction_interior(self):
        """sqrt-hann 50% overlap => overlap-add reconstructs the interior.

        The rfft-style kernel (like the reference's) double-weights interior
        bins relative to DC/Nyquist in the synthesis sum, so exact
        reconstruction holds for signals without DC/Nyquist energy — use a
        bandlimited test signal (real speech is in this regime)."""
        L = 64
        hop = 32
        t = np.arange(1024)
        rng = np.random.default_rng(1)
        x = sum(rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * f * t / L
                                               + rng.uniform(0, 6))
                for f in range(3, 20))
        x = x[None].astype(np.float32)
        mag, phase, _, _ = conv_stft(jnp.asarray(x), L, hop, L)
        y = np.asarray(conv_istft(mag, phase, L, hop, L))
        # interior (skip one frame at each edge)
        xi = x[0, L:-L]
        yi = y[0, L:-L]
        scale = np.dot(yi, xi) / np.dot(xi, xi)
        err = np.linalg.norm(yi - scale * xi) / np.linalg.norm(xi)
        # The rfft-kernel transpose-conv synthesis halves the weight of the
        # DC/Nyquist bins (sum over F of cos(w(k-j)) = N/2*delta + even-lag
        # term); the sqrt-hann window leaks a little energy there, bounding
        # round-trip accuracy at ~0.3% — identical in the torch reference.
        assert abs(scale - 1.0) < 1e-3, scale
        assert err < 5e-3, err

    def test_kernel_cached(self):
        k1 = conv_stft_kernel(512, 256, 512)
        k2 = conv_stft_kernel(512, 256, 512)
        assert k1 is k2
        assert k1.shape == (512, 2 * 257)


# ---------------------------------------------------------------------------
# Directional features
# ---------------------------------------------------------------------------
class TestDirectionalFeatures:
    def _mics(self):
        rng = np.random.default_rng(0)
        return rng.standard_normal((2, 4, 1024)).astype(np.float32)

    def test_ipd_matches_phase_difference(self):
        rng = np.random.default_rng(1)
        real = rng.standard_normal((1, 3, 5, 7)).astype(np.float32)
        imag = rng.standard_normal((1, 3, 5, 7)).astype(np.float32)
        cos_ipd, sin_ipd = compute_ipd(jnp.asarray(real), jnp.asarray(imag),
                                       [0, 1], [1, 2])
        phase = np.arctan2(imag, real)
        want_cos = np.cos(phase[:, [0, 1]] - phase[:, [1, 2]])
        want_sin = np.sin(phase[:, [0, 1]] - phase[:, [1, 2]])
        np.testing.assert_allclose(np.asarray(cos_ipd), want_cos, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sin_ipd), want_sin, atol=1e-4)

    def test_directional_feature_computer_shapes(self):
        mod = DirectionalFeatureComputer(
            n_fft=256, win_length=256, hop_length=128,
            input_features=("LPS", "IPD"), mic_pairs=((0, 1), (0, 2), (1, 3)),
            lps_channel=0, use_sin_IPD=True)
        y = jnp.asarray(self._mics())
        variables = mod.init(jax.random.PRNGKey(0), y)
        feat, mag, phase, real, imag = mod.apply(variables, y)
        f = 256 // 2 + 1
        k = (1024 - 256) // 128 + 1
        assert mod.directional_feature_dim == f + 2 * 3 * f
        assert feat.shape == (2, mod.directional_feature_dim, k)
        assert mag.shape == (2, 4, f, k)

    def test_channel_directional_feature_computer_shapes(self):
        mod = ChannelDirectionalFeatureComputer(
            n_fft=256, win_length=256, hop_length=128,
            input_features=("LPS", "IPD"), mic_pairs=((0, 1), (2, 3)),
            lps_channel=1)
        y = jnp.asarray(self._mics())
        variables = mod.init(jax.random.PRNGKey(0), y)
        feat, mag, *_ = mod.apply(variables, y)
        f = 129
        k = (1024 - 256) // 128 + 1
        assert mod.directional_feature_dim == 1 + 2
        assert feat.shape == (2, 3, f, k)

    def test_channel_wise_layer_norm(self):
        x = np.random.default_rng(0).standard_normal((2, 5, 9)) \
            .astype(np.float32) * 3 + 1
        mod = ChannelWiseLayerNorm(5)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = np.asarray(mod.apply(variables, jnp.asarray(x)))
        # normalized over the N axis per (b, k)
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.std(axis=1), 1.0, atol=1e-2)


# ---------------------------------------------------------------------------
# Beamforming
# ---------------------------------------------------------------------------
class TestBeamforming:
    def test_psd_matrix(self):
        rng = np.random.default_rng(0)
        spec = (rng.standard_normal((2, 5, 3, 7))
                + 1j * rng.standard_normal((2, 5, 3, 7)))
        got = np.asarray(bf.get_power_spectral_density_matrix(
            jnp.asarray(spec.real) + 1j * jnp.asarray(spec.imag)))
        want = np.einsum("bfct,bfet->bftce", spec, spec.conj())
        np.testing.assert_allclose(got, want, atol=1e-4)
        # hermitian per (t)
        np.testing.assert_allclose(got, np.conj(np.swapaxes(got, -1, -2)),
                                   atol=1e-4)

    def test_beamforming_vector(self):
        rng = np.random.default_rng(1)
        w = (rng.standard_normal((2, 5, 7, 3))
             + 1j * rng.standard_normal((2, 5, 7, 3)))
        mix = (rng.standard_normal((2, 5, 3, 7))
               + 1j * rng.standard_normal((2, 5, 3, 7)))
        got = np.asarray(bf.apply_beamforming_vector(jnp.asarray(w),
                                                     jnp.asarray(mix)))
        want = np.einsum("bftc,bfct->bft", w.conj(), mix)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_crf_filter(self):
        rng = np.random.default_rng(2)
        crf = (rng.standard_normal((2, 5, 7, 4))
               + 1j * rng.standard_normal((2, 5, 7, 4)))
        mix = (rng.standard_normal((2, 3, 5, 4, 7))
               + 1j * rng.standard_normal((2, 3, 5, 4, 7)))
        got = np.asarray(bf.apply_crf_filter(jnp.asarray(crf),
                                             jnp.asarray(mix)))
        want = np.einsum("bftd,bcfdt->bcft", crf.conj(), mix)
        np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# Complex sequence model parity
# ---------------------------------------------------------------------------
class TestComplexSequenceModel:
    @pytest.mark.parametrize("kind", ["LSTM", "GRU"])
    def test_parity(self, kind):
        import torch
        load_reference()
        from FullSubNet_plus.speech_enhance.audio_zen.model.module \
            import sequence_model as ref_sm
        tnet = ref_sm.Complex_SequenceModel(
            input_size=6, output_size=4, hidden_size=8, num_layers=2,
            bidirectional=False, sequence_model=kind,
            output_activate_function="Tanh").eval()
        x = np.random.default_rng(0).standard_normal((2, 12, 9)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()
        jnet = ComplexSequenceModel(
            input_size=6, output_size=4, hidden_size=8, num_layers=2,
            bidirectional=False, sequence_model=kind,
            output_activate_function="Tanh")
        sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
        params = convert_complex_sequence_model(sd, num_layers=2)
        got = np.asarray(jnet.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Attention variant parity
# ---------------------------------------------------------------------------
class TestAttentionVariants:
    def _ref_attention(self):
        load_reference()
        from FullSubNet_plus.speech_enhance.audio_zen.model.module \
            import attention_model
        return attention_model

    def test_tsse_weight_layer_parity(self):
        import torch
        am = self._ref_attention()
        tnet = am.ChannelTimeSenseSEWeightLayer(num_channels=8).eval()
        x = np.random.default_rng(0).standard_normal((2, 8, 20)) \
            .astype(np.float32)
        with torch.no_grad():
            want, want_w = tnet(torch.from_numpy(x))
        sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
        jnet = ChannelTimeSenseSEWeightLayer(num_channels=8)
        params = convert_tsse(sd, "")
        got, got_w = jnet.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(),
                                   atol=1e-5)

    def test_deep_tsse_parity(self):
        import torch
        am = self._ref_attention()
        tnet = am.ChannelDeepTimeSenseSELayer(num_channels=8).eval()
        x = np.random.default_rng(1).standard_normal((2, 8, 30)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()
        sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
        jnet = ChannelDeepTimeSenseSELayer(num_channels=8)
        got = jnet.apply({"params": convert_deep_tsse(sd)}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_attention_tsse_parity(self):
        import torch
        am = self._ref_attention()
        tnet = am.ChannelTimeSenseAttentionSELayer(num_channels=8).eval()
        x = np.random.default_rng(2).standard_normal((2, 8, 30)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()
        sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
        jnet = ChannelTimeSenseAttentionSELayer(num_channels=8)
        got = jnet.apply({"params": convert_attention_tsse(sd)},
                         jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_self_attention_parity(self):
        import torch
        am = self._ref_attention()
        tnet = am.SelfAttentionlayer(amp_dim=8, att_dim=8).eval()
        x = np.random.default_rng(3).standard_normal((2, 7, 8)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tnet(*([torch.from_numpy(x)] * 3)).numpy()
        sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
        jnet = SelfAttentionLayer(amp_dim=8, att_dim=8)
        got = jnet.apply({"params": convert_self_attention(sd)},
                         jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
