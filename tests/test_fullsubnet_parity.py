"""Full-model parity: FullSubNetPlus / FullSubNet / MultiDirection vs the
actual reference torch models with transplanted (randomly initialized)
weights — the strongest checkpoint-compatibility proof available without the
public best_model.tar (which is not in the checkout)."""
import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference
from generative_audio_tpu.models import (
    FullSubNetPlus, FullSubNetPlusConfig, FullSubNet, FullSubNetConfig,
    MultiDirectionFullSubNetPlus, MultiDirectionConfig,
)
from generative_audio_tpu.utils import torch_convert as tc


@pytest.fixture(scope="module", autouse=True)
def _ref():
    load_reference()


def _small_torch_fsp(**over):
    from FullSubNet_plus.speech_enhance.fullsubnet_plus.model.fullsubnet_plus \
        import FullSubNet_Plus, FullSubNetPlusConfig as TorchCfg
    kwargs = dict(num_freqs=33, look_ahead=2, sb_num_neighbors=3,
                  fb_num_neighbors=0, fb_model_hidden_size=24,
                  sb_model_hidden_size=16, sequence_model="LSTM",
                  channel_attention_model="TSSE", num_groups_in_drop_band=1)
    kwargs.update(over)
    cfg = TorchCfg(**kwargs)
    net = FullSubNet_Plus(cfg)
    net.eval()
    return net, kwargs


@pytest.mark.parametrize("batch,groups", [(1, 1), (3, 1), (4, 2)])
def test_fullsubnet_plus_parity(rng, batch, groups):
    tm, kwargs = _small_torch_fsp(num_groups_in_drop_band=groups)
    mag = np.abs(rng.standard_normal((batch, 1, 33, 18))).astype(np.float32)
    real = rng.standard_normal((batch, 1, 33, 18)).astype(np.float32)
    imag = rng.standard_normal((batch, 1, 33, 18)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mag), torch.from_numpy(real),
                 torch.from_numpy(imag)).numpy()

    cfg = FullSubNetPlusConfig(
        num_freqs=33, sb_num_neighbors=3, fb_model_hidden_size=24,
        sb_model_hidden_size=16, num_groups_in_drop_band=groups)
    jm = FullSubNetPlus(cfg)
    params = tc.convert_fullsubnet_plus(tm.state_dict())
    out = np.asarray(jm.apply({"params": params}, mag, real, imag))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-3)


def test_fullsubnet_v1_parity(rng):
    from FullSubNet_plus.speech_enhance.fullsubnet.model.fullsubnet import \
        Model as TorchFullSubNet
    tm = TorchFullSubNet(
        num_freqs=33, look_ahead=2, sequence_model="LSTM",
        fb_num_neighbors=0, sb_num_neighbors=3,
        fb_output_activate_function="ReLU",
        sb_output_activate_function=False,
        fb_model_hidden_size=24, sb_model_hidden_size=16,
        norm_type="offline_laplace_norm", num_groups_in_drop_band=2,
        weight_init=False)
    tm.eval()
    mag = np.abs(rng.standard_normal((4, 1, 33, 18))).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mag)).numpy()
    cfg = FullSubNetConfig(num_freqs=33, sb_num_neighbors=3,
                           fb_model_hidden_size=24, sb_model_hidden_size=16)
    out = np.asarray(FullSubNet(cfg).apply(
        {"params": tc.convert_fullsubnet(tm.state_dict())}, mag))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-3)


def test_multidirection_parity(rng):
    from nppc_audio.networks import (MultiDirectionConfig as TorchMDCfg,
                                     MultiDirectionFullSubNet_Plus)
    cfg = TorchMDCfg(num_freqs=33, look_ahead=2, sb_num_neighbors=3,
                     fb_num_neighbors=0, fb_model_hidden_size=24,
                     sb_model_hidden_size=16, sequence_model="LSTM",
                     channel_attention_model="TSSE",
                     num_groups_in_drop_band=1, n_directions=3)
    tm = MultiDirectionFullSubNet_Plus(cfg)
    tm.eval()
    shape = (2, 1, 33, 14)
    tensors = [rng.standard_normal(shape).astype(np.float32) for _ in range(6)]
    tensors[0] = np.abs(tensors[0])
    tensors[3] = np.abs(tensors[3])
    with torch.no_grad():
        ref = tm(*[torch.from_numpy(t) for t in tensors]).numpy()

    jcfg = MultiDirectionConfig(
        num_freqs=33, sb_num_neighbors=3, fb_model_hidden_size=24,
        sb_model_hidden_size=16, num_groups_in_drop_band=1, n_directions=3)
    out = np.asarray(MultiDirectionFullSubNetPlus(jcfg).apply(
        {"params": tc.convert_multidirection(tm.state_dict())}, *tensors))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-3)
