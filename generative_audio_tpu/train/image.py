"""Image-line trainers: restoration (MSE/MAE) and NPPC.

Reference: nppc/restoration.py — RestorationTrainer :387-917 (LoopLoader
step loop, chunked grad accumulation, base_step :609-640 MSE/MAE, benchmark
on 256 fixed valid samples -> update_best, checkpoint.pt); nppc/nppc.py —
NPPCTrainer :289-871 (base_step :510-560: w_mat -> normalized err projection
-> reconst_err + lambda-ramped second-moment MSE; benchmark score = mean
reconst_err :561-586).

TPU design: one jitted train step (distort -> restore/PC forward -> loss ->
grads -> Adam) per trainer; distortion randomness is an explicit PRNG key so
the whole step is pure. Frozen restoration forward sits inside the NPPC step
under stop_gradient — XLA dedupes and fuses it with the PC forward. Best-
model tracking keeps a device-side copy of params (reference
auxil.NetWrapper.update_best :399).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from generative_audio_tpu.losses import nppc_objective_real
from generative_audio_tpu.models.image_nppc import (
    ImageNPPCConfig, ImageNPPCModel)
from generative_audio_tpu.models.image_restoration import (
    ImageRestorationConfig, ImageRestorationModel)
from generative_audio_tpu.train.checkpoint import CheckpointManager
from generative_audio_tpu.train.state import (
    TrainState, create_train_state, make_optimizer, jit_init)

__all__ = ["ImageRestorationTrainer", "ImageNPPCTrainer"]


class _ImageTrainerBase:
    """Shared loop/benchmark/best-model scaffolding.

    `mesh` (set by the subclasses) enables data-parallel training — the
    reference's DDP wrap of the image nets (nppc/auxil.py:251,297-308):
    params replicated, each batch sharded on the "data" axis via
    place_batch, gradient all-reduce inserted by XLA."""

    def __init__(self, checkpoint_dir, config_for_ckpt, seed, mesh=None):
        self.mesh = mesh
        self.ckpt = (CheckpointManager(checkpoint_dir, config_for_ckpt)
                     if checkpoint_dir else None)
        self._rng = jax.random.PRNGKey(seed + 1)
        self.loss_history = []
        self.best_score = None
        self.best_params = None

    def _place(self, batch):
        from generative_audio_tpu.parallel import place_batch
        return place_batch(jnp.asarray(batch) if self.mesh is None
                           else batch, self.mesh)

    def _next_rng(self):
        self._rng, key = jax.random.split(self._rng)
        return key

    def _maybe_update_best(self, score: float):
        """Keep the best-scoring params (auxil.py:399-416 update_best)."""
        if self.best_score is None or score < self.best_score:
            self.best_score = score
            # Host copy, NOT an alias: the step jit donates the TrainState,
            # so aliased device buffers would be deleted by the next step
            # (CLAUDE.md: never keep a reference to a pre-step state).
            self.best_params = jax.tree_util.tree_map(
                lambda x: np.array(x), self.state.params)
            return True
        return False

    def _batches(self, dataset, batch_size: int, n_samples: int,
                 seed: int = 42):
        indices = np.random.RandomState(seed).permutation(len(dataset))
        indices = indices[:n_samples]
        for start in range(0, len(indices), batch_size):
            chunk = indices[start:start + batch_size]
            yield np.stack([np.asarray(dataset[int(i)]) for i in chunk])

    def train(self, n_steps: int, batch_size: int = 32,
              benchmark_every: Optional[int] = None, log=print):
        """LoopLoader-style step loop over the train set (auxil.py:124)."""
        dataset = self.model.data_module.train_set \
            if hasattr(self.model, "data_module") \
            else self.restoration_model.data_module.train_set
        n = len(dataset)
        order_rng = np.random.default_rng(0)
        order = order_rng.permutation(n)
        pos = 0
        for step_i in range(n_steps):
            if pos + batch_size > n:
                order = order_rng.permutation(n)
                pos = 0
            idx = order[pos:pos + batch_size]
            pos += batch_size
            batch = np.stack([np.asarray(dataset[int(i)]) for i in idx])
            loss = self.step(batch)
            self.loss_history.append(loss)
            if benchmark_every and (step_i + 1) % benchmark_every == 0:
                score = self.benchmark(batch_size=batch_size)
                is_best = self._maybe_update_best(score)
                log(f"step {int(self.state.step)}: loss={loss:.5f} "
                    f"benchmark={score:.5f}{' *best*' if is_best else ''}")
        if self.ckpt:
            step = int(self.state.step)
            tree = {"params": self.state.params,
                    "opt_state": self.state.opt_state,
                    "step": np.asarray(step)}
            self.ckpt.save_latest(tree, step)
            if self.best_params is not None:
                self.ckpt.save_best({"params": self.best_params,
                                     "step": np.asarray(step)},
                                    self.best_score, step)
            from generative_audio_tpu.train.checkpoint import _is_coordinator
            if _is_coordinator():   # plain-file write: rank 0 only
                self.write_report(self.ckpt.directory / "report.html")
        return self.loss_history

    def write_report(self, path):
        """Self-contained HTML run report with loss curve + sample grids
        (the reference's log_html, nppc/restoration.py:803-917)."""
        from generative_audio_tpu.utils.report import HTMLReport
        rep = HTMLReport(type(self).__name__)
        if self.loss_history:
            rep.add_curve("loss", {"train": self.loss_history})
        metrics = {"steps": int(self.state.step)}
        if self.best_score is not None:
            metrics["best_benchmark"] = self.best_score
        rep.add_scalars("summary", metrics)
        try:
            self._add_report_samples(rep)
        except Exception as e:  # sample figures are best-effort
            rep.add_scalars("samples", {"error": str(e)})
        return rep.write(path)

    def _add_report_samples(self, rep):
        pass


class ImageRestorationTrainer(_ImageTrainerBase):
    """MSE/MAE restoration training (RestorationTrainer :387-917)."""

    @classmethod
    def from_checkpoint(cls, checkpoint_dir, **kwargs):
        """Constructor round-trip: rebuild the model from the checkpoint's
        saved config and restore the latest params — the reference's
        RestorationModel.load (restoration.py:218-224, state_dict carries
        input_args)."""
        from generative_audio_tpu.utils.config import build_dataclass
        mgr = CheckpointManager(checkpoint_dir)
        config_dict = mgr.load_config()
        if config_dict is None:
            raise FileNotFoundError(f"no config.json in {checkpoint_dir}")
        config = build_dataclass(ImageRestorationConfig, config_dict)
        trainer = cls(config, checkpoint_dir=checkpoint_dir, **kwargs)
        restored = mgr.restore("latest", {"params": trainer.state.params},
                               partial=True)
        if restored is not None:
            trainer.state = trainer.state.replace(params=restored["params"])
        return trainer

    def __init__(self, config: ImageRestorationConfig,
                 model: Optional[ImageRestorationModel] = None,
                 checkpoint_dir: Optional[str] = None, seed: int = 0,
                 mesh=None):
        self.config = config
        self.model = model or ImageRestorationModel(config)
        super().__init__(checkpoint_dir, config, seed, mesh=mesh)

        variables = jit_init(self.model.init)(
            jax.random.PRNGKey(config.random_seed))
        tx = make_optimizer(config.lr, (0.9, 0.999),
                            weight_decay=config.weight_decay)
        from generative_audio_tpu.parallel import replicate_state
        self.state = replicate_state(
            create_train_state(variables["params"], tx), mesh)
        self._variables_extra = {k: v for k, v in variables.items()
                                 if k != "params"}
        # donate the state (argnum 0): the old TrainState is dead after
        # each step, donation drops its preservation copies
        self._step_fn = jax.jit(self._train_step, donate_argnums=(0,))
        self._eval_fn = jax.jit(self._eval_loss)

    def _restore(self, params, x_distorted):
        variables = dict(self._variables_extra, params=params)
        return self.model.restore(variables, x_distorted)

    def _loss_value(self, params, x_org, x_distorted):
        x_restored = self._restore(params, x_distorted)
        err = x_org - x_restored
        if self.config.loss_type == "mse":
            return jnp.mean(jnp.square(err))
        if self.config.loss_type == "mae":
            return jnp.mean(jnp.abs(err))
        raise ValueError(f"Unsupported loss_type: {self.config.loss_type!r}")

    def _train_step(self, state: TrainState, key, x_org):
        x_distorted = self.model.distort(x_org, key)
        loss, grads = jax.value_and_grad(self._loss_value)(
            state.params, x_org, x_distorted)
        return state.apply_gradients(grads), loss

    def _eval_loss(self, state: TrainState, key, x_org):
        x_distorted = self.model.distort(x_org, key)
        return self._loss_value(state.params, x_org, x_distorted)

    def step(self, x_org: np.ndarray) -> float:
        self.state, loss = self._step_fn(self.state, self._next_rng(),
                                         self._place(x_org))
        return float(loss)

    def benchmark(self, batch_size: int = 32, max_samples: int = 256) -> float:
        """Mean valid-set loss on a fixed seed-42 subset (ref :700-730)."""
        losses, weights = [], []
        for batch in self._batches(self.model.data_module.valid_set,
                                   batch_size, max_samples):
            key = jax.random.fold_in(jax.random.PRNGKey(42), len(losses))
            losses.append(float(self._eval_fn(self.state, key,
                                              self._place(batch))))
            weights.append(len(batch))
        return float(np.average(losses, weights=weights))

    def restore(self, x_distorted, use_best: bool = True):
        params = (self.best_params if use_best and self.best_params is not None
                  else self.state.params)
        return self._restore(params, jnp.asarray(x_distorted))

    def _add_report_samples(self, rep):
        """original / distorted / restored grid rows (ref log_html fixed
        batch panels)."""
        dm = self.model.data_module
        x = jnp.asarray(np.stack([np.asarray(dm.valid_set[i])
                                  for i in range(min(8, len(dm.valid_set)))]))
        x_d = self.model.distort(x, jax.random.PRNGKey(42))
        x_r = self.restore(x_d, use_best=True)
        rep.add_image_grid("original", np.asarray(x), nrow=8)
        rep.add_image_grid("distorted", np.clip(np.asarray(x_d), 0, 1),
                           nrow=8)
        rep.add_image_grid("restored", np.clip(np.asarray(x_r), 0, 1),
                           nrow=8)


class ImageNPPCTrainer(_ImageTrainerBase):
    """NPPC direction training against a frozen restoration model
    (NPPCTrainer :289-871)."""

    def __init__(self, config: ImageNPPCConfig,
                 restoration_model: ImageRestorationModel,
                 restoration_variables,
                 checkpoint_dir: Optional[str] = None, seed: int = 0,
                 mesh=None):
        self.config = config
        self.restoration_model = restoration_model
        self.restoration_variables = jax.tree_util.tree_map(
            jax.lax.stop_gradient, restoration_variables)
        self.model = ImageNPPCModel(config, restoration_model)
        super().__init__(checkpoint_dir, config, seed, mesh=mesh)

        variables = jit_init(self.model.init)(
            jax.random.PRNGKey(config.random_seed))
        tx = make_optimizer(config.lr, (0.9, 0.999),
                            weight_decay=config.weight_decay)
        from generative_audio_tpu.parallel import replicate_state
        self.state = replicate_state(
            create_train_state(variables["params"]
                               if "params" in variables
                               else variables, tx), mesh)
        # the frozen restoration branch rides in every step: replicate it
        # too so a sharded step never mixes committed single-device
        # constants with mesh-placed operands
        if mesh is not None:
            self.restoration_variables = replicate_state(
                self.restoration_variables, mesh)
        # donate the state (argnum 0): the old TrainState is dead after
        # each step, donation drops its preservation copies
        self._step_fn = jax.jit(self._train_step, donate_argnums=(0,))
        self._eval_fn = jax.jit(self._eval_metrics)

    # The PC wrapper's variables are a dict {"net": ..., "pre_net": ...};
    # create_train_state stores it verbatim as the params pytree.
    def _w_mat(self, pc_variables, x_distorted, x_restored):
        return self.model.wrapper(pc_variables, x_distorted, x_restored)

    def _process_batch(self, key, x_org):
        x_distorted = self.restoration_model.distort(x_org, key)
        x_restored = self.restoration_model.restore(
            self.restoration_variables, x_distorted)
        return x_distorted, jax.lax.stop_gradient(x_restored)

    def _objective(self, pc_variables, step, x_org, x_distorted, x_restored):
        w_mat = self._w_mat(pc_variables, x_distorted, x_restored)
        reconst_err, objective, log = nppc_objective_real(
            w_mat, x_org - x_restored, step,
            self.config.second_moment_loss_grace,
            self.config.second_moment_loss_lambda, eps=0.0)
        return objective, (reconst_err, log)

    def _train_step(self, state: TrainState, key, x_org):
        x_distorted, x_restored = self._process_batch(key, x_org)
        (objective, (reconst_err, _)), grads = jax.value_and_grad(
            self._objective, has_aux=True)(
                state.params, state.step.astype(jnp.float32), x_org,
                x_distorted, x_restored)
        return state.apply_gradients(grads), objective, jnp.mean(reconst_err)

    def _eval_metrics(self, state: TrainState, key, x_org):
        x_distorted, x_restored = self._process_batch(key, x_org)
        _, (reconst_err, _) = self._objective(
            state.params, state.step.astype(jnp.float32), x_org,
            x_distorted, x_restored)
        return jnp.mean(reconst_err)

    def step(self, x_org: np.ndarray) -> float:
        self.state, objective, _ = self._step_fn(
            self.state, self._next_rng(), self._place(x_org))
        return float(objective)

    def benchmark(self, batch_size: int = 32, max_samples: int = 256) -> float:
        """Score = mean reconst_err on fixed valid subset (nppc.py:561-586)."""
        vals, weights = [], []
        for batch in self._batches(
                self.restoration_model.data_module.valid_set,
                batch_size, max_samples):
            key = jax.random.fold_in(jax.random.PRNGKey(42), len(vals))
            vals.append(float(self._eval_fn(self.state, key,
                                            self._place(batch))))
            weights.append(len(batch))
        return float(np.average(vals, weights=weights))

    def get_dirs(self, x_distorted, x_restored):
        return self._w_mat(self.state.params, jnp.asarray(x_distorted),
                           jnp.asarray(x_restored))

    def _add_report_samples(self, rep):
        """PC-direction grids for one validation sample (ref nppc.py
        :604-745 per-dir panels)."""
        dm = self.restoration_model.data_module
        x = jnp.asarray(np.asarray(dm.valid_set[0])[None])
        x_d, x_r = self._process_batch(jax.random.PRNGKey(42), x)
        w = np.asarray(self._w_mat(self.state.params, x_d, x_r))[0]
        norm = np.abs(w).max() + 1e-9
        rep.add_image_grid("pc_directions (normalized)",
                           0.5 + 0.5 * w / norm, nrow=w.shape[0])
