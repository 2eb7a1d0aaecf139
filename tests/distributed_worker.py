"""Worker for test_distributed.py — run under cli/launch.py with the GAT_*
env contract. Two modes:

  basic: one data-parallel loss/grad over a global batch assembled from
         per-process local shards (+ an order-sensitive statistic proving
         the assembled global row order matches the loader's order).
  train: two steps of the tiny-but-structurally-real enhancement training
         config (the dryrun_multichip model) through BatchLoader
         host-sharding + DistributedBatches — multi-process training must
         match the single-process run bit-for-bit.

Rank 0 writes the result JSON for the parent test to compare."""
import json
import sys

import numpy as np


def synthetic_pair(i: int, length: int = 4096):
    rng = np.random.default_rng(1000 + i)
    clean = rng.standard_normal(length).astype(np.float32) * 0.05
    noisy = clean + 0.02 * rng.standard_normal(length).astype(np.float32)
    return noisy, clean


class SyntheticPairs:
    def __init__(self, n: int = 8):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        return synthetic_pair(i)


def tiny_train_config():
    from generative_audio_tpu.models import FullSubNetPlusConfig
    from generative_audio_tpu.train.enhance import EnhanceTrainConfig
    return EnhanceTrainConfig(
        model=FullSubNetPlusConfig(
            num_freqs=32, sb_num_neighbors=3, fb_model_hidden_size=32,
            sb_model_hidden_size=16, num_groups_in_drop_band=2),
        n_fft=62, hop_length=32, win_length=62,
        compute_dtype="float32")


def run_train_steps(loader, mesh=None):
    """Two training steps; single-process when mesh is None."""
    import jax
    from generative_audio_tpu.train.enhance import (
        init_enhance_state, make_enhance_train_step)
    from generative_audio_tpu.parallel import subband_sharding
    from generative_audio_tpu.parallel import distributed as D

    cfg = tiny_train_config()
    state = init_enhance_state(cfg, jax.random.PRNGKey(0))
    step = make_enhance_train_step(
        cfg, subband_sharding=subband_sharding(mesh) if mesh else None,
        donate=False)
    if mesh is not None:
        state = D.replicate_global(mesh, state)
        loader = D.DistributedBatches(loader, mesh)
    losses = []
    for noisy, clean in loader:
        state, loss = step(state, noisy, clean)
        losses.append(float(loss))
    l2 = float(jax.tree.reduce(
        lambda a, x: a + float((np.asarray(x, np.float64) ** 2).sum()),
        state.params, 0.0))
    return losses, l2


def main(out_path: str, mode: str) -> None:
    from generative_audio_tpu.parallel import distributed as D

    multi = D.initialize()
    assert multi, "worker must run under the launcher env contract"

    import jax
    import jax.numpy as jnp
    from generative_audio_tpu.parallel import make_mesh

    assert D.process_count() == 2, D.process_count()
    devices = jax.devices()
    assert len(devices) == 4, devices  # 2 procs x 2 virtual CPU devices

    mesh = make_mesh()  # all 4 on the "data" axis

    if mode == "train":
        from generative_audio_tpu.data import BatchLoader
        loader = BatchLoader(SyntheticPairs(8), global_batch_size=4,
                             shuffle=False, num_workers=1,
                             host_id=D.process_index(),
                             num_hosts=D.process_count())
        losses, l2 = run_train_steps(loader, mesh)
        result = {"rank": D.process_index(), "losses": losses,
                  "param_l2": l2, "n_devices": len(devices)}
    else:
        # Global batch: 8 rows of 16 features, deterministic; each process
        # loads ONLY its rows (the DistributedSampler contract).
        global_b = 8
        rng = np.random.default_rng(0)
        x_full = rng.standard_normal((global_b, 16)).astype(np.float32)
        y_full = rng.standard_normal((global_b,)).astype(np.float32)
        lo, hi = D.local_slice(global_b)
        batch = D.global_batch_from_local(
            mesh, {"x": x_full[lo:hi], "y": y_full[lo:hi]})

        w = jnp.zeros((16,), jnp.float32)

        def loss_fn(w, x, y):
            pred = x @ w
            return jnp.mean((pred - y) ** 2)

        # jit over the mesh: the mean over the sharded batch and the grad
        # reduction are cross-process collectives inserted by XLA.
        loss, grad = jax.jit(jax.value_and_grad(loss_fn))(
            w, batch["x"], batch["y"])
        # order-sensitive: proves assembled global row order == loader order
        order_stat = float(jax.jit(
            lambda y: jnp.sum(y * jnp.arange(global_b, dtype=jnp.float32))
        )(batch["y"]))

        result = {"rank": D.process_index(),
                  "loss": float(loss),
                  "grad_l2": float(jnp.sqrt(jnp.sum(grad ** 2))),
                  "order_stat": order_stat,
                  "n_devices": len(devices)}

    if D.is_coordinator():
        with open(out_path, "w") as f:
            json.dump(result, f)
    print("worker done:", result)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "basic")
