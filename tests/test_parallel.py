"""Multi-chip sharding: mesh construction, sharded training-step equivalence
to single-device, and grad accumulation under the mesh.

Runs on the 8-device virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 set by conftest).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_audio_tpu.parallel import (
    make_mesh, data_sharding, replicated, subband_sharding)
from generative_audio_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from generative_audio_tpu.train.enhance import (
    EnhanceTrainConfig, init_enhance_state, make_enhance_train_step)


def _cfg(groups=1):
    return EnhanceTrainConfig(
        model=FullSubNetPlusConfig(
            num_freqs=16, sb_num_neighbors=2, fb_model_hidden_size=16,
            sb_model_hidden_size=8, num_groups_in_drop_band=groups),
        n_fft=30, hop_length=16, win_length=30, compute_dtype="float32")


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    clean = rng.standard_normal((8, 512)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal((8, 512)).astype(np.float32)
    return noisy, clean


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.devices.size == len(jax.devices())
        mesh2 = make_mesh(band=2)
        assert mesh2.shape["band"] == 2
        assert mesh2.shape["data"] == len(jax.devices()) // 2
        with pytest.raises(AssertionError):
            make_mesh(data=3, band=3)

    def test_shardings_place_arrays(self):
        mesh = make_mesh(band=2)
        x = jnp.zeros((8, 32))
        xs = jax.device_put(x, data_sharding(mesh, 2))
        assert len(xs.sharding.device_set) == mesh.shape["data"] * 2 \
            or xs.sharding.is_fully_replicated is False
        xr = jax.device_put(x, replicated(mesh))
        assert xr.sharding.is_fully_replicated

    def test_subband_sharding_spreads_all_devices(self):
        mesh = make_mesh(band=2)
        x = jnp.zeros((16 * 8, 4, 8))
        xs = jax.device_put(x, subband_sharding(mesh))
        assert len(xs.sharding.device_set) == len(jax.devices())


class TestShardedTraining:
    def test_sharded_step_matches_single_device(self, batch):
        """pjit data-parallel step == single-device step (same math, psum
        inserted by the compiler)."""
        noisy, clean = batch
        cfg = _cfg()
        state = init_enhance_state(cfg, jax.random.PRNGKey(0))
        step = make_enhance_train_step(cfg, donate=False)

        # single device
        s1, loss1 = step(state, noisy, clean)

        # sharded over the full mesh
        mesh = make_mesh()
        state_r = jax.device_put(state, replicated(mesh))
        noisy_s = jax.device_put(noisy, data_sharding(mesh, 2))
        clean_s = jax.device_put(clean, data_sharding(mesh, 2))
        s2, loss2 = step(state_r, noisy_s, clean_s)

        assert np.isclose(float(loss1), float(loss2), atol=1e-5)
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params)
        assert max(jax.tree_util.tree_leaves(diff)) < 1e-5

    def test_sharded_step_with_band_axis_and_accum(self, batch):
        """dp x band mesh + subband constraint + grad accumulation executes
        and matches the unsharded accumulated step."""
        noisy, clean = batch
        cfg = _cfg(groups=2)
        mesh = make_mesh(band=2)
        state = init_enhance_state(cfg, jax.random.PRNGKey(0))
        step_plain = make_enhance_train_step(cfg, donate=False,
                                             accum_steps=2)
        s1, loss1 = step_plain(state, noisy, clean)

        step_sharded = make_enhance_train_step(
            cfg, subband_sharding=subband_sharding(mesh), donate=False,
            accum_steps=2)
        state_r = jax.device_put(state, replicated(mesh))
        noisy_s = jax.device_put(noisy, data_sharding(mesh, 2))
        clean_s = jax.device_put(clean, data_sharding(mesh, 2))
        s2, loss2 = step_sharded(state_r, noisy_s, clean_s)
        assert np.isclose(float(loss1), float(loss2), atol=1e-5)
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params)
        # sharded reductions reorder float sums; Adam amplifies the tiny
        # gradient deltas near sqrt(v)+eps -> sub-1e-3 per step is expected
        assert max(jax.tree_util.tree_leaves(diff)) < 1e-3


class TestDryrunMultichip:
    """The driver invokes __graft_entry__.dryrun_multichip(8) bare (no env
    help); it must self-bootstrap a virtual CPU mesh. MULTICHIP_r01 failed
    exactly here."""

    def test_env_detection(self, monkeypatch):
        import __graft_entry__ as ge
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setenv(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        assert ge._multichip_env_ok(8)
        assert not ge._multichip_env_ok(16)
        monkeypatch.setenv("JAX_PLATFORMS", "")
        assert not ge._multichip_env_ok(8)
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setenv("XLA_FLAGS", "")
        assert not ge._multichip_env_ok(8)

    def test_dryrun_inline(self):
        """Under the test env the dryrun runs in-process and must pass."""
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_dryrun_bootstraps_without_env(self, monkeypatch):
        """With a hostile env (as the driver provides) the dryrun must
        re-exec itself in a correctly-configured child and succeed."""
        import __graft_entry__ as ge
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        monkeypatch.delenv("XLA_FLAGS", raising=False)
        ge.dryrun_multichip(8)


def test_is_initialized_flag():
    """Single-process runs report uninitialized; coordinator still resolves."""
    from generative_audio_tpu.parallel import distributed as D
    assert D.is_initialized() is False
    assert D.is_coordinator() is True
    assert D.process_index() == 0
