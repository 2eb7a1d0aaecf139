"""MOSNet (CNN-BLSTM) objective MOS predictor — architecture + keras-h5
weight transplant.

The reference scores MOSNET through the `speechmetrics` wheel
(FullSubNet_plus/speech_enhance/audio_zen/metrics.py:119-130): a lazy
`speechmetrics.load('mosnet', 10)` whose pretrained CNN-BLSTM (Lo et al.,
"MOSNet: Deep Learning based Objective Assessment for Voice Conversion",
Interspeech 2019) predicts a per-utterance MOS from the magnitude
spectrogram. Neither the wheel nor its weights exist in this image, so the
metric itself stays gated (eval/metrics.MOSNET) — but the *architecture*
and the weight-transplant path are first-party here, mirroring how
utils/torch_convert.py treats the reference's torch checkpoints:

  * `MOSNet` — the exact CNN-BLSTM graph (4 conv blocks of 3x3 convs with
    a stride-(1,3) frequency reduction each, 257 -> 86 -> 29 -> 10 -> 4
    bins; BiLSTM(128); per-frame Dense(128) -> Dense(1); utterance score =
    frame mean), parameterized so tests can run a tiny variant.
  * `load_keras_h5` — converts a keras-saved `.h5` weight file (the layout
    speechmetrics ships as `mosnet.h5`) into flax params by walking
    `model_weights/` in layer order and classifying arrays by shape.
  * `mosnet_score` — feature extraction (librosa-convention magnitude
    STFT, n_fft 512 / hop 256 / periodic hann, centered reflect padding)
    + the reference's 10 s windowing and window-mean reduction
    (speechmetrics Metric(window=10); metrics.py:124-129).

The converter is verified in-image against a hand-assembled keras-layout
h5 plus an independent numpy re-implementation of the forward pass
(tests/test_mosnet.py), and a standing gated test pins against the real
wheel the day one appears — the same independence pattern as
tests/test_stoi_golden.py / tests/test_pesq.py.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MOSNet", "MOSNetConfig", "load_keras_h5", "mosnet_features",
           "mosnet_score"]

SR = 16000
N_FFT = 512
HOP = 256


class MOSNetConfig:
    """Shape knobs; defaults are the published CNN-BLSTM."""

    def __init__(self, num_freqs: int = N_FFT // 2 + 1,
                 conv_channels: Sequence[int] = (16, 32, 64, 128),
                 lstm_units: int = 128, dense_units: int = 128):
        self.num_freqs = num_freqs
        self.conv_channels = tuple(conv_channels)
        self.lstm_units = lstm_units
        self.dense_units = dense_units
        # each block's stride-(1,3) SAME conv takes ceil(f/3)
        f = num_freqs
        for _ in self.conv_channels:
            f = -(-f // 3)
        self.reduced_freqs = f                      # 4 for 257 bins


def _keras_lstm_scan(x, kernel, recurrent, bias, reverse: bool):
    """One keras-semantics LSTM direction over [B, T, D].

    Keras packs gates as [i, f, c, o] along the last axis of `kernel`
    [D, 4H] / `recurrent` [H, 4H] / `bias` [4H]; activations are
    sigmoid/tanh (tf.keras defaults). Returns [B, T, H].
    """
    h_units = recurrent.shape[0]
    xt = jnp.einsum("btd,dg->btg", x, kernel) + bias    # [B, T, 4H]
    if reverse:
        xt = xt[:, ::-1]

    def cell(carry, xg):
        h, c = carry
        g = xg + h @ recurrent
        i, f, cc, o = (g[:, :h_units], g[:, h_units:2 * h_units],
                       g[:, 2 * h_units:3 * h_units], g[:, 3 * h_units:])
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(cc)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    b = x.shape[0]
    zero = jnp.zeros((b, h_units), x.dtype)
    _, hs = jax.lax.scan(cell, (zero, zero), jnp.transpose(xt, (1, 0, 2)))
    hs = jnp.transpose(hs, (1, 0, 2))
    return hs[:, ::-1] if reverse else hs


class MOSNet(nn.Module):
    """CNN-BLSTM MOS predictor. Input: magnitude spectrogram [B, T, F].

    Returns (utterance_score [B], frame_scores [B, T]). Dropout layers in
    the published net are inference-disabled, so they are simply absent.
    """
    config: MOSNetConfig

    @nn.compact
    def __call__(self, mag: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        b, t, f = mag.shape
        x = mag[..., None]                              # [B, T, F, 1]
        for bi, ch in enumerate(cfg.conv_channels):
            for ci, stride in enumerate([(1, 1), (1, 1), (1, 3)]):
                x = nn.Conv(ch, (3, 3), strides=stride, padding="SAME",
                            name=f"conv{bi}_{ci}")(x)
                x = nn.relu(x)
        x = x.reshape(b, t, cfg.reduced_freqs * cfg.conv_channels[-1])

        h = cfg.lstm_units
        fwd = self.param("lstm_fwd", nn.initializers.lecun_normal(),
                         (x.shape[-1] + h + 1, 4 * h))
        bwd = self.param("lstm_bwd", nn.initializers.lecun_normal(),
                         (x.shape[-1] + h + 1, 4 * h))
        d = x.shape[-1]
        hs_f = _keras_lstm_scan(x, fwd[:d], fwd[d:d + h], fwd[d + h],
                                reverse=False)
        hs_b = _keras_lstm_scan(x, bwd[:d], bwd[d:d + h], bwd[d + h],
                                reverse=True)
        x = jnp.concatenate([hs_f, hs_b], axis=-1)      # [B, T, 2H]

        x = nn.relu(nn.Dense(cfg.dense_units, name="dense1")(x))
        frame = nn.Dense(1, name="frame")(x)[..., 0]    # [B, T]
        return jnp.mean(frame, axis=1), frame


def load_keras_h5(path, config: MOSNetConfig | None = None):
    """Convert a keras `.h5` weight file into `MOSNet` flax params.

    Walks `model_weights/` (falling back to the file root for
    weights-only saves) in saved layer order and classifies each layer's
    arrays by shape: 3x3 conv kernels+biases fill `conv{b}_{c}` in order,
    a bidirectional LSTM's forward/backward (kernel, recurrent, bias)
    triples pack into the [D+H+1, 4H] `lstm_fwd`/`lstm_bwd` params, and
    the two (in, out) dense layers land in `dense1`/`frame` (128-wide
    first, 1-wide second). Keras conv kernels are HWIO and dense kernels
    (in, out) — both already the flax convention, so values transplant
    bit-for-bit.
    """
    import h5py

    cfg = config or MOSNetConfig()
    convs, denses, lstm_dirs = [], [], {}

    def harvest(group):
        # keras h5: attrs['layer_names'] at top, 'weight_names' per layer
        names = [n.decode() if isinstance(n, bytes) else n
                 for n in group.attrs.get("layer_names", list(group))]
        for lname in names:
            layer = group[lname]
            wnames = [n.decode() if isinstance(n, bytes) else n
                      for n in layer.attrs.get("weight_names", [])]
            if not wnames:                       # walk nested groups
                stack = [layer]
                while stack:
                    g = stack.pop(0)
                    for k in g:
                        item = g[k]
                        if isinstance(item, h5py.Group):
                            stack.append(item)
                        else:
                            wnames.append(item.name)
            arrays = [np.asarray(layer.file[w] if w.startswith("/")
                                 else layer[w]) for w in wnames]
            classify(lname, wnames, arrays)

    def classify(lname, wnames, arrays):
        kernels = [a for a in arrays if a.ndim == 4]
        if kernels:                              # conv layer(s)
            biases = [a for a in arrays if a.ndim == 1]
            for k, b in zip(kernels, biases):
                convs.append((k, b))
            return
        # LSTM triples: kernel [D,4H], recurrent [H,4H] (square-ish), bias
        mats = [a for a in arrays if a.ndim == 2]
        vecs = [a for a in arrays if a.ndim == 1]
        if len(mats) >= 2 and any(m.shape[1] == 4 * cfg.lstm_units
                                  for m in mats):
            # group per direction by weight-name prefix (forward/backward)
            for direction in ("backward", "forward"):
                trip = [a for n, a in zip(wnames, arrays) if direction in n]
                if len(trip) == 3:
                    lstm_dirs[direction] = trip
            if not lstm_dirs:                    # single unnamed direction
                lstm_dirs["forward"] = [mats[0], mats[1], vecs[0]]
            return
        for m, v in zip(mats, vecs):             # dense layers
            denses.append((m, v))

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        harvest(root)

    n_conv = 3 * len(cfg.conv_channels)
    if len(convs) != n_conv or len(denses) < 2 or len(lstm_dirs) != 2:
        raise ValueError(
            f"unrecognized keras layout: {len(convs)} convs (want "
            f"{n_conv}), {len(denses)} denses, {sorted(lstm_dirs)} lstm "
            "directions")

    params = {}
    for i, (k, b) in enumerate(convs):
        params[f"conv{i // 3}_{i % 3}"] = {"kernel": jnp.asarray(k),
                                           "bias": jnp.asarray(b)}
    for name, key in (("forward", "lstm_fwd"), ("backward", "lstm_bwd")):
        kern, rec, bias = lstm_dirs[name]
        params[key] = jnp.concatenate(
            [jnp.asarray(kern), jnp.asarray(rec),
             jnp.asarray(bias)[None, :]], axis=0)
    denses.sort(key=lambda kv: kv[0].shape[1], reverse=True)
    params["dense1"] = {"kernel": jnp.asarray(denses[0][0]),
                        "bias": jnp.asarray(denses[0][1])}
    params["frame"] = {"kernel": jnp.asarray(denses[1][0]),
                       "bias": jnp.asarray(denses[1][1])}
    return {"params": params}


def mosnet_features(wav: np.ndarray) -> np.ndarray:
    """Magnitude spectrogram, librosa conventions (speechmetrics
    mosnet feature extractor): n_fft 512, hop 256, periodic hann,
    centered with reflect padding. Returns [T, 257] float32."""
    wav = np.asarray(wav, np.float32)
    pad = N_FFT // 2
    x = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP
    idx = (np.arange(N_FFT)[None, :]
           + HOP * np.arange(n_frames)[:, None])
    frames = x[idx] * np.hanning(N_FFT + 1)[:-1]        # periodic hann
    return np.abs(np.fft.rfft(frames, N_FFT, axis=1)).astype(np.float32)


def mosnet_score(wav: np.ndarray, variables, sr: int = SR,
                 config: MOSNetConfig | None = None,
                 window_seconds: float = 10.0) -> float:
    """Utterance MOS: the reference's windowed protocol —
    speechmetrics.load('mosnet', 10) splits into 10 s windows and
    metrics.py:128-129 means the window scores."""
    from scipy.signal import resample_poly

    if sr != SR:
        g = np.gcd(int(sr), SR)
        wav = resample_poly(wav, up=SR // g, down=sr // g)
    cfg = config or MOSNetConfig()
    model = MOSNet(cfg)
    win = int(window_seconds * SR)
    chunks = [wav[s:s + win] for s in range(0, max(len(wav), 1), win)]
    chunks = [c for c in chunks if len(c) >= HOP] or [wav]
    scores = []
    # host metric: stay on CPU like PESQ/STOI — never contend with the
    # accelerator that is busy training/serving (reference runs metrics
    # on CPU workers, calculate_metrics.py:149)
    cpu = jax.devices("cpu")[0]
    apply = jax.jit(lambda v, m: model.apply(v, m)[0])
    with jax.default_device(cpu):
        for c in chunks:
            mag = mosnet_features(c)[None]              # [1, T, F]
            scores.append(float(apply(variables, jnp.asarray(mag))[0]))
    return float(np.mean(scores))
