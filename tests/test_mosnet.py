"""MOSNet architecture + keras-h5 transplant tests.

Truth sources, in the repo's gated-parity pattern (test_stoi_golden.py):
  * an INDEPENDENT numpy re-implementation of the CNN-BLSTM forward
    (loops + explicit SAME padding, written differently from the flax
    module's conv/scan path) checked against the module on weights
    transplanted from a hand-assembled keras-layout h5;
  * a standing gated test against the `speechmetrics` wheel that runs
    the day the wheel appears in an image.

Reference: audio_zen/metrics.py:119-130 (speechmetrics mosnet, 10 s
windows, window-mean).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from generative_audio_tpu.eval.mosnet import (  # noqa: E402
    MOSNet, MOSNetConfig, load_keras_h5, mosnet_features, mosnet_score)

TINY = MOSNetConfig(num_freqs=7, conv_channels=(2, 3), lstm_units=4,
                    dense_units=5)


# ---------------------------------------------------------------- helpers --
def _write_keras_h5(path, cfg, rng):
    """Hand-assemble the keras save layout speechmetrics' mosnet.h5 uses:
    model_weights/<layer>/ groups with layer_names / weight_names attrs,
    conv kernels HWIO, LSTM (kernel, recurrent, bias) per direction."""
    import h5py

    weights = {}
    layer_names = []

    def conv(name, k, b):
        layer_names.append(name)
        weights[name] = [(f"{name}/kernel:0", k), (f"{name}/bias:0", b)]

    in_ch = 1
    for bi, ch in enumerate(cfg.conv_channels):
        for ci in range(3):
            n = "conv2d" if not weights else f"conv2d_{len(weights)}"
            conv(n, rng.standard_normal((3, 3, in_ch, ch)) * 0.3,
                 rng.standard_normal(ch) * 0.1)
            in_ch = ch
    d = cfg.reduced_freqs * cfg.conv_channels[-1]
    h = cfg.lstm_units
    layer_names.append("bidirectional")
    weights["bidirectional"] = []
    for direction in ("forward", "backward"):
        base = f"bidirectional/{direction}_lstm/lstm_cell"
        weights["bidirectional"] += [
            (f"{base}/kernel:0", rng.standard_normal((d, 4 * h)) * 0.3),
            (f"{base}/recurrent_kernel:0",
             rng.standard_normal((h, 4 * h)) * 0.3),
            (f"{base}/bias:0", rng.standard_normal(4 * h) * 0.1),
        ]
    for name, din, dout in (("dense", 2 * h, cfg.dense_units),
                            ("dense_1", cfg.dense_units, 1)):
        layer_names.append(name)
        weights[name] = [
            (f"{name}/kernel:0", rng.standard_normal((din, dout)) * 0.3),
            (f"{name}/bias:0", rng.standard_normal(dout) * 0.1)]

    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        mw.attrs["layer_names"] = [n.encode() for n in layer_names]
        for lname in layer_names:
            g = mw.create_group(lname)
            g.attrs["weight_names"] = [w.encode() for w, _ in weights[lname]]
            for wname, arr in weights[lname]:
                g.create_dataset(wname, data=np.asarray(arr, np.float32))
    return weights


def _np_same_conv(x, k, b, stride_f):
    """[T, F, C] x HWIO kernel -> [T, F'), relu. TF 'SAME': pad so
    out = ceil(in/stride), extra padding at the high end."""
    t, f, _ = x.shape
    kt, kf, ci, co = k.shape
    out_f = -(-f // stride_f)
    pad_t = kt - 1
    pad_f = max((out_f - 1) * stride_f + kf - f, 0)
    xp = np.pad(x, ((pad_t // 2, pad_t - pad_t // 2),
                    (pad_f // 2, pad_f - pad_f // 2), (0, 0)))
    out = np.zeros((t, out_f, co), np.float32)
    for ti in range(t):
        for fi in range(out_f):
            patch = xp[ti:ti + kt, fi * stride_f:fi * stride_f + kf]
            out[ti, fi] = np.tensordot(patch, k, axes=([0, 1, 2],
                                                       [0, 1, 2])) + b
    return np.maximum(out, 0.0)


def _np_lstm(x, kern, rec, bias, reverse):
    """[T, D] keras LSTM direction, gates [i, f, c, o]."""
    h_units = rec.shape[0]
    seq = x[::-1] if reverse else x
    h = np.zeros(h_units)
    c = np.zeros(h_units)
    outs = []
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))                  # noqa: E731
    for xt in seq:
        g = xt @ kern + h @ rec + bias
        i, f, cc, o = np.split(g, 4)
        c = sig(f) * c + sig(i) * np.tanh(cc)
        h = sig(o) * np.tanh(c)
        outs.append(h)
    outs = np.stack(outs)
    return outs[::-1] if reverse else outs


def _np_forward(mag, weights, cfg):
    """Independent literal forward: mag [T, F] -> (utt, frames)."""
    x = mag[..., None].astype(np.float32)
    convs = [w for name in weights if name.startswith("conv2d")
             for w in [weights[name]]]
    for i, layer in enumerate(convs):
        (_, k), (_, b) = layer
        x = _np_same_conv(x, np.asarray(k, np.float32),
                          np.asarray(b, np.float32),
                          stride_f=3 if i % 3 == 2 else 1)
    t = x.shape[0]
    x = x.reshape(t, -1)
    bi = weights["bidirectional"]
    fwd = _np_lstm(x, *[np.asarray(a) for _, a in bi[:3]], reverse=False)
    bwd = _np_lstm(x, *[np.asarray(a) for _, a in bi[3:]], reverse=True)
    x = np.concatenate([fwd, bwd], axis=-1)
    (_, k1), (_, b1) = weights["dense"]
    x = np.maximum(x @ np.asarray(k1) + np.asarray(b1), 0.0)
    (_, k2), (_, b2) = weights["dense_1"]
    frames = (x @ np.asarray(k2) + np.asarray(b2))[:, 0]
    return frames.mean(), frames


# ------------------------------------------------------------------ tests --
def test_forward_shapes_and_determinism():
    model = MOSNet(TINY)
    mag = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 11, 7)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mag)
    utt, frames = model.apply(variables, mag)
    assert utt.shape == (2,) and frames.shape == (2, 11)
    utt2, _ = model.apply(variables, mag)
    np.testing.assert_array_equal(np.asarray(utt), np.asarray(utt2))
    np.testing.assert_allclose(np.asarray(utt),
                               np.asarray(frames).mean(axis=1), rtol=1e-6)


def test_default_config_frequency_reduction():
    cfg = MOSNetConfig()
    assert cfg.num_freqs == 257 and cfg.reduced_freqs == 4


def test_keras_transplant_matches_independent_numpy(tmp_path):
    rng = np.random.default_rng(1)
    h5 = tmp_path / "mosnet_tiny.h5"
    weights = _write_keras_h5(h5, TINY, rng)
    variables = load_keras_h5(h5, TINY)

    mag = rng.standard_normal((9, 7)).astype(np.float32)
    utt, frames = MOSNet(TINY).apply(variables, jnp.asarray(mag[None]))
    utt_np, frames_np = _np_forward(mag, weights, TINY)
    np.testing.assert_allclose(float(utt[0]), utt_np, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(frames[0]), frames_np,
                               rtol=2e-4, atol=2e-5)


def test_features_shape_and_tone_peak():
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    mag = mosnet_features(tone)
    assert mag.shape == (1 + sr // 256, 257)
    # 1 kHz -> bin 1000/(16000/512) = 32
    assert int(np.argmax(mag[10])) == 32


def test_mosnet_score_windows(tmp_path):
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
    # features are always 257-bin, so the scoring config must match that
    # width (channels/units stay tiny for speed)
    cfg = MOSNetConfig(num_freqs=257, conv_channels=(2, 3), lstm_units=4,
                       dense_units=5)
    h5b = tmp_path / "tiny257.h5"
    _write_keras_h5(h5b, cfg, rng)
    var_b = load_keras_h5(h5b, cfg)
    s1 = mosnet_score(wav, var_b, config=cfg, window_seconds=1.0)
    assert np.isfinite(s1)
    # window-mean protocol: 3 x 1 s windows == mean of per-window scores
    per = [mosnet_score(wav[i * 16000:(i + 1) * 16000], var_b, config=cfg,
                        window_seconds=1.0) for i in range(3)]
    np.testing.assert_allclose(s1, np.mean(per), rtol=1e-5)


def test_metric_gating(tmp_path, monkeypatch):
    from generative_audio_tpu.eval import metrics

    monkeypatch.delenv("GAT_MOSNET_WEIGHTS", raising=False)
    try:
        import speechmetrics  # noqa: F401
        pytest.skip("speechmetrics present: MOSNET dispatches to the wheel")
    except ImportError:
        pass
    with pytest.raises(metrics.MetricUnavailable):
        metrics.MOSNET(np.zeros(16000), np.zeros(16000))


def test_metric_env_weights_path(tmp_path, monkeypatch):
    """metrics.MOSNET computes through $GAT_MOSNET_WEIGHTS with a
    full-size-shaped keras file."""
    try:
        import speechmetrics  # noqa: F401
        pytest.skip("speechmetrics present: wheel takes precedence")
    except ImportError:
        pass
    from generative_audio_tpu.eval import metrics

    rng = np.random.default_rng(3)
    h5 = tmp_path / "mosnet.h5"
    _write_keras_h5(h5, MOSNetConfig(), rng)
    monkeypatch.setenv("GAT_MOSNET_WEIGHTS", str(h5))
    metrics._mos_variables = None
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    score = metrics.MOSNET(wav, wav)
    assert np.isfinite(score)
    metrics._mos_variables = None


@pytest.mark.gated
def test_against_speechmetrics_wheel():
    """Standing gated parity test: pins the transplant + forward against
    the reference's scorer the day the wheel exists in an image."""
    speechmetrics = pytest.importorskip("speechmetrics")
    import speechmetrics.absolute.mosnet as sm_mosnet
    from pathlib import Path

    h5 = Path(sm_mosnet.__file__).parent / "weights" / "mosnet.h5"
    if not h5.exists():
        pytest.skip("wheel present but weights file not found")
    rng = np.random.default_rng(4)
    wav = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    wheel = speechmetrics.load("mosnet", 10)
    expected = float(np.mean(wheel(wav, rate=16000)["mosnet"]))
    variables = load_keras_h5(h5)
    got = mosnet_score(wav, variables)
    np.testing.assert_allclose(got, expected, atol=5e-3)
