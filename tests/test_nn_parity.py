"""Parity tests: flax L1 blocks vs the ACTUAL reference torch modules with
transplanted weights (random init -> convert -> forward equality)."""
import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference
from generative_audio_tpu.nn import (
    SequenceModel, ChannelTimeSenseSELayer, ChannelSELayer, ChannelECALayer,
    ChannelCBAMLayer,
)
from generative_audio_tpu.utils import torch_convert as tc


@pytest.fixture(scope="module", autouse=True)
def _ref():
    load_reference()


def _torch_seq_model(*args, **kwargs):
    from FullSubNet_plus.speech_enhance.audio_zen.model.module.sequence_model \
        import SequenceModel as TorchSequenceModel
    return TorchSequenceModel(*args, **kwargs)


@pytest.mark.parametrize("kind,act", [("LSTM", "Tanh"), ("LSTM", False),
                                      ("GRU", "ReLU")])
def test_sequence_model_rnn_parity(rng, kind, act):
    tm = _torch_seq_model(input_size=12, output_size=4, hidden_size=16,
                          num_layers=2, bidirectional=False,
                          sequence_model=kind, output_activate_function=act)
    tm.eval()
    x = rng.standard_normal((3, 12, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    jm = SequenceModel(input_size=12, output_size=4, hidden_size=16,
                       num_layers=2, bidirectional=False,
                       sequence_model=kind,
                       output_activate_function=act or None)
    params = tc.convert_sequence_model(tm.state_dict(), "", kind)
    out = np.asarray(jm.apply({"params": params}, x))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_sequence_model_bidirectional_parity(rng):
    tm = _torch_seq_model(input_size=8, output_size=3, hidden_size=10,
                          num_layers=2, bidirectional=True,
                          sequence_model="LSTM",
                          output_activate_function="Tanh")
    tm.eval()
    x = rng.standard_normal((2, 8, 15)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    jm = SequenceModel(input_size=8, output_size=3, hidden_size=10,
                       num_layers=2, bidirectional=True,
                       sequence_model="LSTM", output_activate_function="Tanh")
    params = tc.convert_sequence_model(tm.state_dict(), "", "LSTM",
                                       bidirectional=True)
    out = np.asarray(jm.apply({"params": params}, x))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_sequence_model_tcn_parity(rng):
    tm = _torch_seq_model(input_size=16, output_size=16, hidden_size=32,
                          num_layers=2, bidirectional=False,
                          sequence_model="TCN",
                          output_activate_function="ReLU")
    tm.eval()
    x = rng.standard_normal((2, 16, 24)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    jm = SequenceModel(input_size=16, output_size=16, hidden_size=32,
                       num_layers=2, bidirectional=False,
                       sequence_model="TCN", output_activate_function="ReLU")
    params = tc.convert_sequence_model(tm.state_dict(), "", "TCN")
    out = np.asarray(jm.apply({"params": params}, x))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def _torch_attention(name, **kwargs):
    from FullSubNet_plus.speech_enhance.audio_zen.model.module import \
        attention_model as am
    return getattr(am, name)(**kwargs)


def test_tsse_parity(rng):
    tm = _torch_attention("ChannelTimeSenseSELayer", num_channels=32,
                          kersize=[3, 5, 10])
    tm.eval()
    x = rng.standard_normal((2, 32, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    jm = ChannelTimeSenseSELayer(num_channels=32, kersize=(3, 5, 10))
    params = tc.convert_tsse(tm.state_dict(), "")
    out = np.asarray(jm.apply({"params": params}, x))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_se_parity(rng):
    tm = _torch_attention("ChannelSELayer", num_channels=16)
    tm.eval()
    x = rng.standard_normal((2, 16, 30)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(ChannelSELayer(num_channels=16).apply(
        {"params": tc.convert_se(tm.state_dict(), "")}, x))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_eca_parity(rng):
    tm = _torch_attention("ChannelECAlayer", channel=16)
    tm.eval()
    x = rng.standard_normal((2, 16, 30)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    params = {"conv": {"kernel": tm.conv.weight.detach().numpy()
                       .transpose(2, 1, 0)}}
    out = np.asarray(ChannelECALayer().apply({"params": params}, x))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_cbam_parity(rng):
    tm = _torch_attention("ChannelCBAMLayer", num_channels=16)
    tm.eval()
    x = rng.standard_normal((2, 16, 30)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(ChannelCBAMLayer(num_channels=16).apply(
        {"params": tc.convert_se(tm.state_dict(), "")}, x))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
