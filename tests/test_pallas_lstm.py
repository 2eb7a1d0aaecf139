"""Pallas fused LSTM: interpret-mode numerics vs the lax.scan reference,
gradient flow through the custom VJP, and LSTMLayer wiring.

On CPU the kernel runs in Pallas interpret mode — same program, no TPU
needed; the real-chip speed path is exercised by bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from generative_audio_tpu.ops.pallas_lstm import (
    lstm_scan_tm, lstm_scan_reference_tm)
from generative_audio_tpu.nn.recurrent import LSTMLayer


def _rand(shape, scale=0.5, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape) * scale,
        jnp.float32)


class TestPallasLSTM:
    def test_forward_matches_reference(self):
        t, b, h = 13, 12, 16
        gx = _rand((t, b, 4 * h))
        whh = _rand((h, 4 * h), scale=0.2, seed=1)
        want = np.asarray(lstm_scan_reference_tm(gx, whh))
        got = np.asarray(lstm_scan_tm(gx, whh, out_dtype=jnp.float32))
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_reverse_matches_reference(self):
        t, b, h = 9, 8, 8
        gx = _rand((t, b, 4 * h), seed=2)
        whh = _rand((h, 4 * h), scale=0.2, seed=3)
        want = np.asarray(lstm_scan_reference_tm(gx, whh, reverse=True))
        got = np.asarray(lstm_scan_tm(gx, whh, reverse=True,
                                      out_dtype=jnp.float32))
        np.testing.assert_allclose(got, want, atol=5e-3)
        # and differs from the forward scan
        fwd = np.asarray(lstm_scan_tm(gx, whh, out_dtype=jnp.float32))
        assert np.abs(fwd - got).max() > 1e-3

    def test_batch_padding(self):
        """b not a multiple of the block size exercises the pad/crop path."""
        t, b, h = 5, 11, 8
        gx = _rand((t, b, 4 * h), seed=4)
        whh = _rand((h, 4 * h), scale=0.2, seed=5)
        got = np.asarray(lstm_scan_tm(gx, whh, out_dtype=jnp.float32))
        want = np.asarray(lstm_scan_reference_tm(gx, whh))
        assert got.shape == (t, b, h)
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_gradients_flow(self):
        t, b, h = 7, 8, 8
        gx = _rand((t, b, 4 * h), seed=6)
        whh = _rand((h, 4 * h), scale=0.2, seed=7)

        def loss_p(gx, w):
            return jnp.sum(lstm_scan_tm(gx, w, False, 256, None,
                                        jnp.float32) ** 2)

        def loss_r(gx, w):
            return jnp.sum(lstm_scan_reference_tm(gx, w) ** 2)

        gp = jax.grad(loss_p, argnums=(0, 1))(gx, whh)
        gr = jax.grad(loss_r, argnums=(0, 1))(gx, whh)
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                                   atol=2e-2, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                                   atol=2e-2, rtol=1e-2)

    def test_lstm_layer_pallas_matches_scan_path(self):
        x = _rand((3, 10, 6), seed=8)
        layer_scan = LSTMLayer(hidden_size=8, use_pallas=False)
        params = layer_scan.init(jax.random.PRNGKey(0), x)
        want = np.asarray(layer_scan.apply(params, x))
        layer_pallas = LSTMLayer(hidden_size=8, use_pallas=True)
        got = np.asarray(layer_pallas.apply(params, x))
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_lstm_layer_pallas_bidirectional(self):
        x = _rand((2, 6, 4), seed=9)
        layer_scan = LSTMLayer(hidden_size=8, bidirectional=True,
                               use_pallas=False)
        params = layer_scan.init(jax.random.PRNGKey(1), x)
        want = np.asarray(layer_scan.apply(params, x))
        layer_pallas = LSTMLayer(hidden_size=8, bidirectional=True,
                                 use_pallas=True)
        got = np.asarray(layer_pallas.apply(params, x))
        np.testing.assert_allclose(got, want, atol=5e-3)


class TestPallasGRU:
    def test_forward_matches_reference(self):
        from generative_audio_tpu.ops.pallas_lstm import (
            gru_scan_tm, gru_scan_reference_tm)
        t, b, h = 13, 12, 16
        gx = _rand((t, b, 3 * h), seed=10)
        whh = _rand((h, 3 * h), scale=0.2, seed=11)
        bhh = _rand((3 * h,), scale=0.1, seed=12)
        want = np.asarray(gru_scan_reference_tm(gx, whh, bhh))
        got = np.asarray(gru_scan_tm(gx, whh, bhh, False, 256, True,
                                     jnp.float32))
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_reverse_and_grads(self):
        from generative_audio_tpu.ops.pallas_lstm import (
            gru_scan_tm, gru_scan_reference_tm)
        t, b, h = 7, 8, 8
        gx = _rand((t, b, 3 * h), seed=13)
        whh = _rand((h, 3 * h), scale=0.2, seed=14)
        bhh = _rand((3 * h,), scale=0.1, seed=15)
        want = np.asarray(gru_scan_reference_tm(gx, whh, bhh, reverse=True))
        got = np.asarray(gru_scan_tm(gx, whh, bhh, True, 256, True,
                                     jnp.float32))
        np.testing.assert_allclose(got, want, atol=5e-3)
        gp = jax.grad(lambda *a: jnp.sum(
            gru_scan_tm(*a, False, 256, True, jnp.float32) ** 2),
            argnums=(0, 1, 2))(gx, whh, bhh)
        gr = jax.grad(lambda *a: jnp.sum(
            gru_scan_reference_tm(*a) ** 2), argnums=(0, 1, 2))(gx, whh, bhh)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-2, rtol=1e-2)

    def test_gru_layer_pallas_matches_scan_path(self):
        from generative_audio_tpu.nn.recurrent import GRULayer
        x = _rand((3, 10, 6), seed=16)
        layer_scan = GRULayer(hidden_size=8, use_pallas=False)
        params = layer_scan.init(jax.random.PRNGKey(2), x)
        want = np.asarray(layer_scan.apply(params, x))
        layer_pallas = GRULayer(hidden_size=8, use_pallas=True)
        got = np.asarray(layer_pallas.apply(params, x))
        np.testing.assert_allclose(got, want, atol=5e-3)


def test_pick_block_heuristic():
    from generative_audio_tpu.ops.pallas_lstm import _pick_block, _round_up
    # FullSubNet+ sub-band batch: same padding as 256 but a faster block
    assert _pick_block(2056, 576) == 576
    # never explodes padding to chase a big block
    assert _round_up(600, _pick_block(600, 576)) <= 768
    # tiny batches collapse to the 8-row tile
    assert _pick_block(4, 576) == 8
    # block_b is an honest cap (VMEM bound for larger hidden sizes)
    assert _pick_block(2056, 256) <= 256
    assert _pick_block(2056, 64) <= 64


class TestPallasBackwardKernel:
    """The round-2 dedicated Pallas backward (reverse-time sweep, VMEM
    dh/dc carry, in-kernel dW_hh accumulation) vs lax.scan reference VJP."""

    def test_reverse_scan_gradients(self):
        t, b, h = 7, 8, 8
        gx = _rand((t, b, 4 * h), seed=20)
        whh = _rand((h, 4 * h), scale=0.2, seed=21)
        gp = jax.grad(lambda *a: jnp.sum(
            lstm_scan_tm(*a, True, 256, None, jnp.float32) ** 2),
            argnums=(0, 1))(gx, whh)
        gr = jax.grad(lambda *a: jnp.sum(
            lstm_scan_reference_tm(*a, reverse=True) ** 2),
            argnums=(0, 1))(gx, whh)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-2, rtol=1e-2)

    def test_padded_batch_gradients(self):
        """b=11 pads to the block; padded rows must contribute zero grad."""
        t, b, h = 5, 11, 8
        gx = _rand((t, b, 4 * h), seed=22)
        whh = _rand((h, 4 * h), scale=0.2, seed=23)
        gp = jax.grad(lambda *a: jnp.sum(
            lstm_scan_tm(*a, False, 256, None, jnp.float32) ** 2),
            argnums=(0, 1))(gx, whh)
        gr = jax.grad(lambda *a: jnp.sum(
            lstm_scan_reference_tm(*a) ** 2), argnums=(0, 1))(gx, whh)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-2, rtol=1e-2)

    def test_nonuniform_cotangent(self):
        """A structured (non-symmetric) upstream gradient, not just 2*y."""
        t, b, h = 6, 8, 8
        gx = _rand((t, b, 4 * h), seed=24)
        whh = _rand((h, 4 * h), scale=0.2, seed=25)
        ct = _rand((t, b, h), seed=26)

        def loss(fn):
            return lambda *a: jnp.sum(fn(*a) * ct)

        gp = jax.grad(loss(lambda g_, w: lstm_scan_tm(
            g_, w, False, 256, None, jnp.float32)), argnums=(0, 1))(gx, whh)
        gr = jax.grad(loss(lstm_scan_reference_tm), argnums=(0, 1))(gx, whh)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-2, rtol=1e-2)

    def test_lstm_layer_gradients(self):
        from generative_audio_tpu.ops.pallas_lstm import (
            lstm_layer_tm, _layer_reference)
        t, b, f, h = 5, 9, 6, 8
        x = _rand((t, b, f), seed=27)
        wih = _rand((f, 4 * h), scale=0.3, seed=28)
        whh = _rand((h, 4 * h), scale=0.2, seed=29)
        bias = _rand((4 * h,), scale=0.1, seed=30)
        gp = jax.grad(lambda *a: jnp.sum(
            lstm_layer_tm(*a, False, 256, None, jnp.float32) ** 2),
            argnums=(0, 1, 2, 3))(x, wih, whh, bias)
        gr = jax.grad(lambda *a: jnp.sum(
            _layer_reference(*a, False) ** 2),
            argnums=(0, 1, 2, 3))(x, wih, whh, bias)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=3e-2, rtol=2e-2)

    def test_gru_padded_and_reverse_gradients(self):
        from generative_audio_tpu.ops.pallas_lstm import (
            gru_scan_tm, gru_scan_reference_tm)
        t, b, h = 6, 11, 8
        gx = _rand((t, b, 3 * h), seed=31)
        whh = _rand((h, 3 * h), scale=0.2, seed=32)
        bhh = _rand((3 * h,), scale=0.1, seed=33)
        for rev in (False, True):
            gp = jax.grad(lambda *a: jnp.sum(
                gru_scan_tm(*a, rev, 256, None, jnp.float32) ** 2),
                argnums=(0, 1, 2))(gx, whh, bhh)
            gr = jax.grad(lambda *a: jnp.sum(
                gru_scan_reference_tm(*a, reverse=rev) ** 2),
                argnums=(0, 1, 2))(gx, whh, bhh)
            for a, b_ in zip(gp, gr):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                           atol=2e-2, rtol=1e-2)


def test_planned_batch_matches_internal_padding():
    """Pre-padding inputs to planned_batch(b) must make the kernels' internal
    _pad_batch a no-op (that second full-size pad copy OOM'd batch 16)."""
    from generative_audio_tpu.ops.pallas_lstm import (
        planned_batch, _pick_block, _round_up)
    for b in (7, 64, 2056, 2176, 4112):
        bp = planned_batch(b)
        assert bp >= b
        assert bp == _round_up(bp, _pick_block(bp, 576)), b
        # idempotent: an already-planned batch plans to itself
        assert planned_batch(bp) == bp, b


def test_scan_backward_escape_hatch(rng):
    """USE_PALLAS_BACKWARD=False falls back to the round-1 scan-remat
    backward; grads must match the Pallas backward (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.ops import pallas_lstm as pl

    t, b, h = 6, 8, 16
    gx = jnp.asarray(rng.standard_normal((t, b, 4 * h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.1, jnp.float32)

    def loss(gx, w):
        return jnp.sum(pl.lstm_scan_tm(gx, w, out_dtype=jnp.float32) ** 2)

    g_pallas = jax.grad(loss, argnums=(0, 1))(gx, w)
    old = pl.USE_PALLAS_BACKWARD
    try:
        pl.USE_PALLAS_BACKWARD = False
        g_scan = jax.grad(loss, argnums=(0, 1))(gx, w)
    finally:
        pl.USE_PALLAS_BACKWARD = old
    for a, c in zip(g_pallas, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-2, atol=2e-3)


def test_layer_backward_escape_hatch(rng):
    """USE_PALLAS_BACKWARD=False must also reach lstm_layer_tm (it silently
    did nothing for this entry point before): grads fall back to a vjp
    through the lax.scan reference and match the Pallas backward."""
    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.ops import pallas_lstm as pl

    t, b, f, h = 6, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((t, b, f)), jnp.float32)
    wi = jnp.asarray(rng.standard_normal((f, 4 * h)) * 0.1, jnp.float32)
    wh = jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(4 * h) * 0.1, jnp.float32)

    def loss(x, wi, wh, bias):
        return jnp.sum(
            pl.lstm_layer_tm(x, wi, wh, bias, out_dtype=jnp.float32) ** 2)

    g_pallas = jax.grad(loss, argnums=(0, 1, 2, 3))(x, wi, wh, bias)
    old = pl.USE_PALLAS_BACKWARD
    try:
        pl.USE_PALLAS_BACKWARD = False
        g_scan = jax.grad(loss, argnums=(0, 1, 2, 3))(x, wi, wh, bias)
    finally:
        pl.USE_PALLAS_BACKWARD = old
    for a, c in zip(g_pallas, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-2, atol=2e-3)


class TestChunkedLayer:
    """Time-chunked hoisted projection (lstm_layer_tm_chunked): identical
    numerics to the full-projection path at a fraction of the gates HBM."""

    def _setup(self, t=37, b=12, f=20, h=16):
        x = _rand((t, b, f), scale=0.3, seed=10)
        wi = _rand((f, 4 * h), scale=0.2, seed=11)
        wh = _rand((h, 4 * h), scale=0.2, seed=12)
        bias = _rand((4 * h,), scale=0.1, seed=13)
        return x, wi, wh, bias

    def test_matches_unchunked_bitwise_and_reference(self):
        from generative_audio_tpu.ops.pallas_lstm import (
            lstm_layer_tm_chunked, lstm_scan_tm, _layer_reference)
        x, wi, wh, bias = self._setup()
        for reverse in (False, True):
            # the production un-chunked path: hoisted fp32 projection,
            # bf16 gates into the kernel
            gates = jnp.einsum("tbf,fg->tbg", x, wi,
                               preferred_element_type=jnp.float32) + bias
            want = np.asarray(lstm_scan_tm(gates, wh, reverse, 576, True,
                                           jnp.float32))
            ref = np.asarray(_layer_reference(x, wi, wh, bias, reverse))
            for t_chunk in (8, 16, 37, 64):   # ragged + whole + oversize
                got = np.asarray(lstm_layer_tm_chunked(
                    x, wi, wh, bias, reverse, t_chunk, 576, True,
                    jnp.float32))
                # chunking must not change the numerics AT ALL
                np.testing.assert_array_equal(
                    got, want, err_msg=f"{reverse=} {t_chunk=}")
                # and both stay close to the fp32 lax.scan reference
                np.testing.assert_allclose(got, ref, atol=8e-3,
                                           err_msg=f"{reverse=} {t_chunk=}")

    def test_grad_delegates_to_full_projection_backward(self):
        from generative_audio_tpu.ops.pallas_lstm import (
            lstm_layer_tm_chunked, _layer_reference)
        x, wi, wh, bias = self._setup()
        p = {"wi": wi, "wh": wh, "b": bias}

        def loss_c(p):
            return jnp.sum(lstm_layer_tm_chunked(
                x, p["wi"], p["wh"], p["b"], False, 8, 576, True,
                jnp.float32) ** 2)

        def loss_r(p):
            return jnp.sum(_layer_reference(
                x, p["wi"], p["wh"], p["b"], False) ** 2)

        g1, g2 = jax.grad(loss_c)(p), jax.grad(loss_r)(p)
        for k in p:   # bf16 residuals in the Pallas backward: loose rel tol
            rel = float(jnp.abs(g1[k] - g2[k]).max()
                        / (jnp.abs(g2[k]).max() + 1e-9))
            assert rel < 5e-2, (k, rel)

    def test_lstm_layer_switches_to_chunked_path(self, monkeypatch):
        """LSTMLayer takes the chunked route when the gates buffer would
        exceed the limit, with unchanged outputs."""
        from generative_audio_tpu.nn import recurrent as R
        layer = LSTMLayer(hidden_size=16, use_pallas=True)
        x = _rand((2, 70, 20), scale=0.3, seed=20)   # [B, T, F]
        v = layer.init(jax.random.PRNGKey(0), x)
        base = np.asarray(layer.apply(v, x))
        called = {}
        import generative_audio_tpu.ops.pallas_lstm as P
        orig = P.lstm_layer_tm_chunked

        def spy(*args, **kw):
            called["yes"] = True
            return orig(*args, **kw)

        monkeypatch.setattr(P, "lstm_layer_tm_chunked", spy)
        monkeypatch.setattr(R, "_GATES_BYTES_LIMIT", 1024)  # force chunking
        got = np.asarray(layer.apply(v, x))
        assert called.get("yes")
        np.testing.assert_allclose(got, base, atol=2e-4)


class TestChunkedGRULayer:
    def _setup(self, t=37, b=12, f=20, h=16):
        x = _rand((t, b, f), scale=0.3, seed=30)
        wi = _rand((f, 3 * h), scale=0.2, seed=31)
        wh = _rand((h, 3 * h), scale=0.2, seed=32)
        bi = _rand((3 * h,), scale=0.1, seed=33)
        bh = _rand((3 * h,), scale=0.1, seed=34)
        return x, wi, wh, bi, bh

    def test_matches_unchunked_bitwise(self):
        from generative_audio_tpu.ops.pallas_lstm import (
            gru_layer_tm_chunked, gru_scan_tm, gru_scan_reference_tm)
        x, wi, wh, bi, bh = self._setup()
        for reverse in (False, True):
            gates = jnp.einsum("tbf,fg->tbg", x, wi,
                               preferred_element_type=jnp.float32) + bi
            want = np.asarray(gru_scan_tm(gates, wh, bh, reverse, 576, True,
                                          jnp.float32))
            ref = np.asarray(gru_scan_reference_tm(
                gates.astype(jnp.float32), wh, bh, reverse=reverse))
            for t_chunk in (8, 16, 37, 64):
                got = np.asarray(gru_layer_tm_chunked(
                    x, wi, wh, bi, bh, reverse, t_chunk, 576, True,
                    jnp.float32))
                np.testing.assert_array_equal(
                    got, want, err_msg=f"{reverse=} {t_chunk=}")
                np.testing.assert_allclose(got, ref, atol=8e-3)

    def test_grad_matches_reference(self):
        from generative_audio_tpu.ops.pallas_lstm import (
            gru_layer_tm_chunked, gru_scan_reference_tm)
        x, wi, wh, bi, bh = self._setup()
        p = {"wi": wi, "wh": wh, "bi": bi, "bh": bh}

        def loss_c(p):
            return jnp.sum(gru_layer_tm_chunked(
                x, p["wi"], p["wh"], p["bi"], p["bh"], False, 8, 576, True,
                jnp.float32) ** 2)

        def loss_r(p):
            gates = jnp.einsum("tbf,fg->tbg", x, p["wi"],
                               preferred_element_type=jnp.float32) + p["bi"]
            return jnp.sum(gru_scan_reference_tm(
                gates, p["wh"], p["bh"]) ** 2)

        g1, g2 = jax.grad(loss_c)(p), jax.grad(loss_r)(p)
        for k in p:
            rel = float(jnp.abs(g1[k] - g2[k]).max()
                        / (jnp.abs(g2[k]).max() + 1e-9))
            assert rel < 5e-2, (k, rel)

    def test_gru_layer_switches_to_chunked_path(self, monkeypatch):
        from generative_audio_tpu.nn import recurrent as R
        from generative_audio_tpu.nn.recurrent import GRULayer
        layer = GRULayer(hidden_size=16, use_pallas=True)
        x = _rand((2, 70, 20), scale=0.3, seed=40)
        v = layer.init(jax.random.PRNGKey(0), x)
        base = np.asarray(layer.apply(v, x))
        monkeypatch.setattr(R, "_GATES_BYTES_LIMIT", 1024)
        got = np.asarray(layer.apply(v, x))
        np.testing.assert_allclose(got, base, atol=1e-6)
