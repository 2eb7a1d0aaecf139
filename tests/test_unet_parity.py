"""Parity: inpainting UNet / RestorationWrapper / PC wrapper vs the actual
reference torch modules with transplanted weights (eval mode, running BN
stats)."""
import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference
from generative_audio_tpu.nn.unet import UNet, RestorationWrapper, UNet2
from generative_audio_tpu.models.pc_wrapper import (
    AudioInpaintingPCWrapper, AudioInpaintingPCWrapperConfig)
from generative_audio_tpu.utils import torch_convert as tc


@pytest.fixture(scope="module", autouse=True)
def _ref():
    load_reference()


def _torch_unet(in_ch=1, out_ch=1, dropout=0.0):
    from nppc_audio.inpainting.networks.unet import UNet as TorchUNet, \
        UNetConfig as TorchUNetConfig
    net = TorchUNet(TorchUNetConfig(in_channels=in_ch, out_channels=out_ch,
                                    dropout=dropout))
    net.eval()
    return net


def test_unet_parity(rng):
    tm = _torch_unet(1, 1, 0.2)
    x = rng.standard_normal((2, 1, 32, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    jm = UNet(in_channels=1, out_channels=1, dropout=0.2)
    variables = tc.convert_unet(tm.state_dict())
    out = np.asarray(jm.apply(variables, x, train=False))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_restoration_wrapper_parity(rng):
    from nppc_audio.inpainting.networks.unet import RestorationWrapper as TorchRW
    tm = _torch_unet(1, 1, 0.0)
    trw = TorchRW(tm)
    trw.eval()
    x = rng.standard_normal((2, 1, 32, 64)).astype(np.float32)
    mask = (rng.uniform(size=(2, 1, 32, 64)) > 0.4).astype(np.float32)
    with torch.no_grad():
        ref = trw(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    jm = RestorationWrapper(UNet(in_channels=1, out_channels=1))
    variables = tc.convert_unet(trw.state_dict(), prefix="net.")
    variables = {"params": {"net": variables["params"]},
                 "batch_stats": {"net": variables["batch_stats"]}}
    out = np.asarray(jm.apply(variables, x, mask, train=False))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_inpainting_pc_wrapper_parity(rng):
    from nppc_audio.inpainting.nppc.pc_wrapper import (
        AudioInpaintingPCWrapper as TorchPCW,
        AudioInpaintingPCWrapperConfig as TorchPCWCfg)
    from nppc_audio.inpainting.networks.unet import UNetConfig as TorchUNetConfig
    tm = TorchPCW(TorchPCWCfg(
        model_configuration=TorchUNetConfig(in_channels=2, out_channels=5),
        n_dirs=5))
    tm.eval()
    x = rng.standard_normal((2, 2, 32, 64)).astype(np.float32)
    # frame mask expanded over F (known region == 1)
    frame_mask = (rng.uniform(size=(2, 64)) > 0.2).astype(np.float32)
    mask = np.broadcast_to(frame_mask[:, None, None, :], (2, 1, 32, 64)).copy()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    jm = AudioInpaintingPCWrapper(AudioInpaintingPCWrapperConfig(
        in_channels=2, out_channels=5, n_dirs=5))
    variables = tc.convert_unet(tm.state_dict(), prefix="net.")
    variables = {"params": {"net": variables["params"]},
                 "batch_stats": {"net": variables["batch_stats"]}}
    out = np.asarray(jm.apply(variables, x, mask, train=False))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-2)


def test_unet2_shapes(rng):
    """UNet2 (stride-2 encoder variant) smoke: shape-preserving forward."""
    x = rng.standard_normal((1, 1, 128, 256)).astype(np.float32)
    jm = UNet2(in_channels=1, out_channels=1)
    import jax
    variables = jm.init(jax.random.PRNGKey(0), x, train=False)
    out = jm.apply(variables, x, train=False)
    assert out.shape == (1, 1, 128, 256)


def test_mc_dropout_flag_isolates_dropout(rng):
    """mc_dropout=True must stochasticize the output (dropout active) while
    leaving BatchNorm on running averages (no mutable batch_stats needed) —
    the reference's enable_dropout semantics (utils.py:333-339)."""
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.nn.unet import UNet
    net = UNet(in_channels=1, out_channels=1, dropout=0.5)
    x = jnp.asarray(rng.standard_normal((1, 1, 32, 32)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    # eval: deterministic
    a = net.apply(variables, x, train=False)
    b = net.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # mc_dropout: stochastic across rngs, NO mutable collections required
    c = net.apply(variables, x, train=False, mc_dropout=True,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    d = net.apply(variables, x, train=False, mc_dropout=True,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(c) - np.asarray(d)).max() > 1e-6
