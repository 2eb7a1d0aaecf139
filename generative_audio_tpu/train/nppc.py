"""NPPC trainers: inpainting line (UNet PC heads over a frozen restoration
UNet) and denoising line (MultiDirection FullSubNet+ over a frozen enhancer).

References:
  inpainting — nppc_audio/inpainting/trainer/nppc_trainer.py:48-210,
    base_step :609-656 (preprocess -> NPPC model -> error vs frozen pred ->
    projection objective, grad clip 1.0, Adam, periodic validation :689-706)
  denoising  — nppc_audio/trainer.py:40-371, base_step :234-317 (w_mat from
    waveforms; gt/pred cRM with drop_band :337-371; complex objective)
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from generative_audio_tpu.models.nppc_model import (
    InpaintingNPPCModel, InpaintingNPPCConfig,
    DenoisingNPPCModel, DenoisingNPPCConfig)
from generative_audio_tpu.ops.preprocess import preprocess_data
from generative_audio_tpu.ops.stft import stft_ri
from generative_audio_tpu.ops.mask import build_complex_ideal_ratio_mask_ri
from generative_audio_tpu.ops.subband import drop_band
from generative_audio_tpu.losses import (
    nppc_objective_real, nppc_objective_complex, nppc_objective_mc_aligned)
from generative_audio_tpu.train.state import (
    TrainState, create_train_state, make_optimizer, jit_init)
from generative_audio_tpu.train.checkpoint import CheckpointManager

__all__ = ["NPPCInpaintingTrainConfig", "NPPCInpaintingTrainer",
           "NPPCDenoisingTrainConfig", "NPPCDenoisingTrainer"]


# ------------------------------------------------------------- inpainting --
@dataclasses.dataclass(frozen=True)
class NPPCInpaintingTrainConfig:
    model: InpaintingNPPCConfig = InpaintingNPPCConfig()
    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.5, 0.999)
    max_grad_norm: float = 1.0
    second_moment_loss_lambda: float = 1.0
    second_moment_loss_grace: int = 500
    num_freqs: int = 128
    num_frames: int = 256
    log_interval: int = 100
    save_interval: int = 1000
    # "base_step" (error-projection, nppc_trainer.py:338-385) or
    # "mc_pca_aligned" (base_step2, nppc_trainer.py:244-336: align each NPPC
    # direction to the matching MC-dropout-PCA direction)
    objective_variant: str = "base_step"
    n_mc_samples: int = 50
    # lax.map chunk for the in-step MC passes: a 50-wide vmapped UNet
    # inside the train step needs ~37.6 GB of simultaneous activations
    # (measured OOM on the 16 GB chip); chunking bounds it to one chunk
    mc_chunk_size: int = 5


class NPPCInpaintingTrainer:
    """Trains ONLY the PC-wrapper params; the restoration sub-model is frozen
    (zero-grad via stop_gradient + masked out of the optimizer update).

    `mesh` enables data-parallel training (the reference's DDP wrap,
    nppc/auxil.py:297-308): params replicated, batches sharded on the
    "data" axis, gradient all-reduce inserted by XLA. Multi-process runs
    lift the state via cli.train's replicate_from_coordinator instead."""

    def __init__(self, config: NPPCInpaintingTrainConfig,
                 restoration_variables=None,
                 checkpoint_dir: Optional[str] = None, seed: int = 0,
                 mesh=None):
        self.config = config
        self.mesh = mesh
        self.model = InpaintingNPPCModel(config.model)
        dummy = jnp.zeros((1, 1, config.num_freqs, config.num_frames))
        variables = jit_init(lambda k: self.model.init(
            k, dummy, jnp.ones_like(dummy), train=False))(
            jax.random.PRNGKey(seed))
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        if restoration_variables is not None:
            # transplant the pretrained (frozen) restoration UNet
            params = dict(params)
            params["pretrained_restoration_model"] = \
                restoration_variables["params"]
            # params-only checkpoints carry no batch_stats — keep the
            # freshly initialized stats rather than storing a None sub-entry
            rest_stats = restoration_variables.get("batch_stats")
            if rest_stats is not None:
                batch_stats = dict(batch_stats or {})
                batch_stats["pretrained_restoration_model"] = rest_stats

        import optax
        tx = make_optimizer(config.learning_rate, config.betas,
                            clip_norm=config.max_grad_norm)
        # freeze the restoration branch exactly like the reference's
        # requires_grad=False eval() module
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            param_labels=jax.tree_util.Partial(self._label))
        self.state = create_train_state(params, tx, batch_stats=batch_stats)
        from generative_audio_tpu.parallel import replicate_state
        self.state = replicate_state(self.state, mesh)
        self.ckpt = (CheckpointManager(checkpoint_dir, config)
                     if checkpoint_dir else None)
        self._rng = jax.random.PRNGKey(seed + 1)
        # donate the state (argnum 0): the old TrainState is dead after
        # each step, donation drops its preservation copies
        self._step_fn = jax.jit(self._train_step, donate_argnums=(0,))
        self._eval_fn = jax.jit(self._eval_step)
        self.loss_history = []
        self.reconst_err_history = []

    @staticmethod
    def _label(params):
        return {k: ("frozen" if k == "pretrained_restoration_model"
                    else "train") for k in params}

    @classmethod
    def from_artifact(cls, config: "NPPCInpaintingTrainConfig",
                      registry_root, artifact_ref: str =
                      "restoration-model:latest", **kwargs):
        """Build the trainer with frozen restoration weights fetched from a
        named artifact — the reference's wandb-artifact checkpoint flow
        (inpainting/nppc/nppc_model.py:52-98 _load_from_wandb), served by
        the local ArtifactRegistry (utils.tracking)."""
        from generative_audio_tpu.utils.tracking import ArtifactRegistry
        from generative_audio_tpu.models.nppc_model import (
            InpaintingRestorationModel)
        art_dir = ArtifactRegistry(registry_root).get_artifact(artifact_ref)
        # the artifact holds a CheckpointManager directory (possibly one
        # level down when a whole checkpoint dir was logged as files)
        if not (art_dir / "latest").exists():
            candidates = [d for d in art_dir.iterdir()
                          if (d / "latest").exists()]
            if not candidates:
                raise FileNotFoundError(
                    f"artifact {artifact_ref} holds no 'latest' checkpoint")
            art_dir = candidates[0]
        rest = InpaintingRestorationModel(config.model.restoration)
        dummy = jnp.zeros((1, 1, config.num_freqs, config.num_frames))
        template = jit_init(lambda k: rest.init(
            k, dummy, jnp.ones_like(dummy), train=False))(
            jax.random.PRNGKey(0))
        ckpt = CheckpointManager(art_dir)
        tree = {"params": template["params"],
                "batch_stats": template.get("batch_stats")}
        restored = ckpt.restore("latest", tree, partial=True)
        if restored is None:
            raise FileNotFoundError(
                f"artifact {artifact_ref} holds no 'latest' checkpoint")
        return cls(config,
                   restoration_variables={
                       "params": restored["params"],
                       "batch_stats": restored["batch_stats"]},
                   **kwargs)

    def _objective(self, params, batch_stats, rng, batch, step, train: bool):
        masked_spec, mask_frames, clean_spec = batch
        clean_norm_log, mask4, masked_norm_log = preprocess_data(
            clean_spec, masked_spec, mask_frames)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if rng is None:
            rng = jax.random.PRNGKey(0)        # deterministic validation
        drop_rng, mc_rng = jax.random.split(rng)
        rngs = {"dropout": drop_rng} if train else None
        new_stats = batch_stats
        if train:
            # training-mode BN in the PC UNet updates its running stats
            w_mat, mutated = self.model.apply(
                variables, masked_norm_log, mask4, train=True, rngs=rngs,
                mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            w_mat = self.model.apply(variables, masked_norm_log, mask4,
                                     train=False)
        if self.config.objective_variant == "mc_pca_aligned":
            # base_step2 (nppc_trainer.py:244-336): the target basis is the
            # MC-dropout-PCA of the frozen restoration model, recomputed per
            # batch; gradient flows only through w_mat.
            from generative_audio_tpu.eval.mc_dropout import (
                calculate_unet_baseline)
            baseline = calculate_unet_baseline(
                lambda v, x, m, rngs: self.model.apply(
                    v, x, m, method=self.model.mc_restoration, rngs=rngs),
                variables, masked_norm_log, mask4, mc_rng,
                n_mc_samples=self.config.n_mc_samples,
                n_components=self.config.model.pc_wrapper.n_dirs,
                mc_chunk_size=self.config.mc_chunk_size)
            # fixed target: prune the 50-pass forward from the backward
            # graph entirely (the objective stop-gradients it again)
            baseline = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                              baseline)
            reconst_err, objective, log = nppc_objective_mc_aligned(
                w_mat, baseline["scaled_principal_components"],
                baseline["singular_vals"], step.astype(jnp.float32),
                grace=self.config.second_moment_loss_grace,
                lambda_scale=self.config.second_moment_loss_lambda)
            return objective, (reconst_err, new_stats, log)
        pred = self.model.apply(variables, masked_norm_log, mask4,
                                method=self.model.get_pred_spec_mag_norm)
        err = clean_norm_log - pred                      # [B, 1, F, T]
        reconst_err, objective, log = nppc_objective_real(
            w_mat, err, step.astype(jnp.float32),
            grace=self.config.second_moment_loss_grace,
            lambda_scale=self.config.second_moment_loss_lambda)
        return objective, (reconst_err, new_stats, log)

    def _train_step(self, state: TrainState, rng, batch):
        (obj, (reconst, new_stats, _)), grads = jax.value_and_grad(
            self._objective, has_aux=True)(
            state.params, state.batch_stats, rng, batch, state.step, True)
        return (state.apply_gradients(grads, new_batch_stats=new_stats),
                obj, jnp.mean(reconst))

    def _eval_step(self, state: TrainState, batch):
        obj, (reconst, _, _) = self._objective(
            state.params, state.batch_stats, None, batch, state.step, False)
        return obj, jnp.mean(reconst)

    def train(self, loader, n_steps: Optional[int] = None,
              n_epochs: Optional[int] = None, val_loader=None, log=print):
        from generative_audio_tpu.data.loader import LoopIterator
        loop = LoopIterator(loader, n_steps=n_steps, n_epochs=n_epochs)
        # Metrics stay on-device between log points (see restoration.py:
        # a per-step float() sync serializes dispatch over the tunnel).
        pending = []
        step = int(self.state.step)
        from generative_audio_tpu.parallel import place_batch
        for batch in loop:
            self._rng, step_rng = jax.random.split(self._rng)
            self.state, obj, reconst = self._step_fn(
                self.state, step_rng,
                place_batch((batch[0], batch[1], batch[2]), self.mesh))
            pending.append((obj, reconst))
            step += 1
            if step % self.config.log_interval == 0:
                self.loss_history.extend(float(o) for o, _ in pending)
                self.reconst_err_history.extend(float(r) for _, r in pending)
                pending = []
                msg = (f"step {step}: objective={self.loss_history[-1]:.5f} "
                       f"reconst_err={self.reconst_err_history[-1]:.5f}")
                if val_loader is not None:
                    v_obj, v_rec = self.validate(val_loader)
                    msg += f" val={v_obj:.5f}/{v_rec:.5f}"
                log(msg)
            if self.ckpt and step % self.config.save_interval == 0:
                self._save(step)
        self.loss_history.extend(float(o) for o, _ in pending)
        self.reconst_err_history.extend(float(r) for _, r in pending)
        if self.ckpt:
            self._save(step, final=True)
        return self.loss_history

    def validate(self, val_loader):
        from generative_audio_tpu.parallel import place_batch
        objs, recs = [], []
        for batch in val_loader:
            o, r = self._eval_fn(
                self.state,
                place_batch((batch[0], batch[1], batch[2]), self.mesh))
            objs.append(float(o))
            recs.append(float(r))
        return float(np.mean(objs)), float(np.mean(recs))

    def _save(self, step: int, final: bool = False):
        tree = {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "step": np.asarray(step)}
        self.ckpt.save_latest(tree, step)
        if final:
            ts = time.strftime("%Y%m%d_%H%M%S")
            self.ckpt.save_step(tree, step)
            from generative_audio_tpu.train.checkpoint import _is_coordinator
            if _is_coordinator():   # plain-file write: rank 0 only
                (Path(self.ckpt.directory) / f"metrics_final_{ts}.json"
                 ).write_text(json.dumps({
                     "timestamp": ts, "total_steps": step,
                     "final_loss": self.loss_history[-1]
                     if self.loss_history else None}, indent=4))

    def restore_latest(self) -> bool:
        """Resume from the latest checkpoint (`-R`); partial=True tolerates
        checkpoints written before opt_state joined the tree."""
        from generative_audio_tpu.train.checkpoint import resume_latest
        new_state, _ = resume_latest(
            self.ckpt, self.state, ("params", "batch_stats", "opt_state"))
        if new_state is None:
            return False
        self.state = new_state
        return True


# -------------------------------------------------------------- denoising --
@dataclasses.dataclass(frozen=True)
class NPPCDenoisingTrainConfig:
    model: DenoisingNPPCConfig = DenoisingNPPCConfig()
    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    max_grad_norm: float = 1.0
    second_moment_loss_lambda: float = 1.0
    second_moment_loss_grace: int = 500
    log_interval: int = 100
    save_interval: int = 1000


class NPPCDenoisingTrainer:
    """Ref nppc_audio/trainer.py:40-371. `mesh` enables data-parallel
    training (see NPPCInpaintingTrainer)."""

    def __init__(self, config: NPPCDenoisingTrainConfig,
                 restoration_params=None,
                 checkpoint_dir: Optional[str] = None, seed: int = 0,
                 example_length: int = 16384, mesh=None):
        self.config = config
        self.mesh = mesh
        self.model = DenoisingNPPCModel(config.model)
        dummy = jnp.zeros((1, example_length))
        params = jit_init(self.model.init)(
            jax.random.PRNGKey(seed), dummy)["params"]
        if restoration_params is not None:
            params = dict(params)
            params["pretrained_restoration_model"] = restoration_params

        import optax
        tx = make_optimizer(config.learning_rate, config.betas,
                            clip_norm=config.max_grad_norm)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            param_labels=jax.tree_util.Partial(
                NPPCInpaintingTrainer._label))
        self.state = create_train_state(params, tx)
        from generative_audio_tpu.parallel import replicate_state
        self.state = replicate_state(self.state, mesh)
        self.ckpt = (CheckpointManager(checkpoint_dir, config)
                     if checkpoint_dir else None)
        # donate the state (argnum 0): the old TrainState is dead after
        # each step, donation drops its preservation copies
        self._step_fn = jax.jit(self._train_step, donate_argnums=(0,))
        self.loss_history = []
        self.reconst_err_history = []

    def _objective(self, params, batch, step):
        noisy, clean = batch
        s = self.config.model.stft
        # ONE forward yields both w_mat and the frozen enhancer's cRM
        # (get_pred_crm would rerun the most expensive module in the step)
        w_mat, pred_crm = self.model.apply(
            {"params": params}, noisy,
            method=self.model.forward_with_pred_crm)
        nr, ni = stft_ri(noisy, s.nfft, s.hop_length, s.win_length)
        cr, ci = stft_ri(clean, s.nfft, s.hop_length, s.win_length)
        gt_crm = build_complex_ideal_ratio_mask_ri(nr, ni, cr, ci)
        groups = self.config.model.pc_wrapper.num_groups_in_drop_band
        gt_crm = drop_band(jnp.transpose(gt_crm, (0, 3, 1, 2)), groups)
        pred_crm = drop_band(pred_crm, groups)
        reconst_err, objective, log = nppc_objective_complex(
            w_mat, gt_crm, pred_crm, step.astype(jnp.float32),
            grace=self.config.second_moment_loss_grace,
            lambda_scale=self.config.second_moment_loss_lambda)
        return objective, (reconst_err, log)

    def _train_step(self, state: TrainState, batch):
        (obj, (reconst, _)), grads = jax.value_and_grad(
            self._objective, has_aux=True)(state.params, batch, state.step)
        return state.apply_gradients(grads), obj, jnp.mean(reconst)

    def train(self, loader, n_steps: Optional[int] = None,
              n_epochs: Optional[int] = None, log=print):
        from generative_audio_tpu.data.loader import LoopIterator
        loop = LoopIterator(loader, n_steps=n_steps, n_epochs=n_epochs)
        # on-device metrics between log points (see NPPCInpaintingTrainer)
        pending = []
        step = int(self.state.step)
        from generative_audio_tpu.parallel import place_batch
        for batch in loop:
            self.state, obj, reconst = self._step_fn(
                self.state, place_batch((batch[0], batch[1]), self.mesh))
            pending.append((obj, reconst))
            step += 1
            if step % self.config.log_interval == 0:
                self.loss_history.extend(float(o) for o, _ in pending)
                self.reconst_err_history.extend(
                    float(r) for _, r in pending)
                pending = []
                log(f"step {step}: objective={self.loss_history[-1]:.5f} "
                    f"reconst_err={self.reconst_err_history[-1]:.5f}")
            if self.ckpt and step % self.config.save_interval == 0:
                self._save(step)
        self.loss_history.extend(float(o) for o, _ in pending)
        self.reconst_err_history.extend(float(r) for _, r in pending)
        if self.ckpt:
            # final checkpoint + metrics JSON, like the inpainting trainer —
            # a run ending between save_interval boundaries must not lose
            # training steps on resume (ref trainer.py:136-160)
            self._save(step, final=True)
        return self.loss_history

    def _save(self, step: int, final: bool = False):
        tree = {"params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": np.asarray(step)}
        self.ckpt.save_latest(tree, step)
        if final:
            ts = time.strftime("%Y%m%d_%H%M%S")
            self.ckpt.save_step(tree, step)
            from generative_audio_tpu.train.checkpoint import _is_coordinator
            if _is_coordinator():   # plain-file write: rank 0 only
                (Path(self.ckpt.directory) / f"metrics_final_{ts}.json"
                 ).write_text(json.dumps({
                     "timestamp": ts, "total_steps": step,
                     "final_objective": self.loss_history[-1]
                     if self.loss_history else None,
                     "final_reconst_err": self.reconst_err_history[-1]
                     if self.reconst_err_history else None}, indent=4))

    def restore_latest(self) -> bool:
        """Resume from the latest checkpoint (`-R`)."""
        from generative_audio_tpu.train.checkpoint import resume_latest
        new_state, _ = resume_latest(self.ckpt, self.state,
                                     ("params", "opt_state"))
        if new_state is None:
            return False
        self.state = new_state
        return True
