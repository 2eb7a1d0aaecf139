"""Edge-case robustness: silence, clipping, extreme values through the
signal ops and the enhancement pipeline (NaN guards the reference only has
as a helper, audio_zen/utils.py:41)."""
import jax
import jax.numpy as jnp
import numpy as np

import generative_audio_tpu.ops as ops


class TestSTFTEdges:
    def test_silence_roundtrip(self):
        wav = jnp.zeros((2, 8000))
        r, i = ops.stft_ri(wav, 512, 256, 512)
        assert np.all(np.asarray(r) == 0) and np.all(np.asarray(i) == 0)
        out = ops.istft_ri(r, i, 512, 256, 512, length=8000)
        assert np.all(np.isfinite(np.asarray(out)))
        assert np.allclose(np.asarray(out), 0)

    def test_fullscale_clipped_signal(self):
        t = np.arange(8000)
        wav = jnp.asarray(np.sign(np.sin(2 * np.pi * 440 * t / 16000))
                          .astype(np.float32))[None]
        r, i = ops.stft_ri(wav, 512, 256, 512)
        out = ops.istft_ri(r, i, 512, 256, 512, length=8000)
        assert np.all(np.isfinite(np.asarray(out)))
        # round-trip error small in the interior
        err = np.abs(np.asarray(out)[0, 512:-512]
                     - np.asarray(wav)[0, 512:-512]).max()
        assert err < 1e-3

    def test_denormal_amplitudes(self):
        wav = jnp.full((1, 4096), 1e-30, jnp.float32)
        r, i = ops.stft_ri(wav, 512, 256, 512)
        assert np.all(np.isfinite(np.asarray(r)))


class TestCIRMEdges:
    def test_cirm_zero_noisy(self):
        """Silent noisy spectrum: the K*(1-e)/(1+e) compression must stay
        finite (mask.py:44-60 clamps at +-9.9)."""
        zr = jnp.zeros((1, 9, 4))
        cr = jnp.ones((1, 9, 4))
        m = ops.build_complex_ideal_ratio_mask_ri(zr, zr, cr, zr)
        assert np.all(np.isfinite(np.asarray(m)))

    def test_compress_decompress_saturation(self):
        big = jnp.asarray([[-1e6, -9.9, 0.0, 9.9, 1e6]])
        c = ops.compress_cIRM(big)
        assert np.all(np.abs(np.asarray(c)) <= 10.0)
        d = ops.decompress_cIRM(c)
        assert np.all(np.isfinite(np.asarray(d)))
        # interior values round-trip
        mid = jnp.asarray([[-5.0, -1.0, 0.0, 1.0, 5.0]])
        np.testing.assert_allclose(
            np.asarray(ops.decompress_cIRM(ops.compress_cIRM(mid))),
            np.asarray(mid), atol=1e-3)


class TestModelEdges:
    def test_model_on_silence_is_finite(self):
        from generative_audio_tpu.models import (FullSubNetPlus,
                                                 FullSubNetPlusConfig)
        cfg = FullSubNetPlusConfig(
            num_freqs=9, sb_num_neighbors=1, fb_model_hidden_size=8,
            sb_model_hidden_size=8, num_groups_in_drop_band=1)
        model = FullSubNetPlus(cfg)
        dummy = jnp.zeros((1, 1, 9, 16))
        params = model.init(jax.random.PRNGKey(0), dummy, dummy,
                            dummy)["params"]
        out = model.apply({"params": params}, dummy, dummy, dummy)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_norms_on_constant_input(self):
        """offline/cumulative norms divide by means — constant (incl. zero)
        inputs must not produce NaNs."""
        for fn in (ops.offline_laplace_norm, ops.cumulative_laplace_norm,
                   ops.offline_gaussian_norm, ops.cumulative_layer_norm):
            for val in (0.0, 3.0):
                x = jnp.full((2, 1, 8, 12), val)
                y = np.asarray(fn(x))
                assert np.all(np.isfinite(y)), (fn.__name__, val)
