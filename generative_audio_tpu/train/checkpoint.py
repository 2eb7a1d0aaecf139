"""Checkpointing: orbax-backed, covering the reference's three schemes
(SURVEY.md §5.4):
  (a) latest + per-step-tagged + best (FullSubNet+ base_trainer.py:160-201)
  (b) config round-trip in the checkpoint (nppc/restoration.py:205-224)
  (c) final timestamped checkpoint + metrics JSON (nppc_trainer.py:604-628)

Also: import of reference torch .tar/.pt checkpoints via utils.torch_convert.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


def _to_saveable(tree):
    return jax.tree.map(np.asarray, tree)


# The shared rank-0 predicate (kept as a module global so tests can
# monkeypatch the gating without touching jax itself).
from generative_audio_tpu.parallel.distributed import (  # noqa: E402
    is_coordinator as _is_coordinator)


class CheckpointManager:
    """latest/best/step-tagged checkpoints with config round-trip.

    Multi-process semantics: orbax saves are COLLECTIVE — every rank must
    enter `_save` (orbax itself gates file writes to the primary host and
    barriers the rest; a rank-0-only call deadlocks rank 0 in that barrier
    while the other ranks run ahead). Only the plain-JSON sidecars
    (config.json, latest_step.json, best_score.json) are coordinator-gated
    here — the reference's rank==0 gating (base_trainer.py:160) maps to
    exactly those non-collective writes.
    """

    def __init__(self, directory, config: Optional[Any] = None):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        if config is not None:
            self.save_config(config)

    # ------------------------------------------------------------ config ---
    def save_config(self, config):
        if not _is_coordinator():
            return
        if dataclasses.is_dataclass(config):
            config = dataclasses.asdict(config)
        with open(self.directory / "config.json", "w") as f:
            json.dump(config, f, indent=2, default=str)

    def load_config(self) -> Optional[Dict]:
        path = self.directory / "config.json"
        if not path.exists():
            return None
        return json.loads(path.read_text())

    # ------------------------------------------------------------- save ----
    def _save(self, name: str, tree):
        path = self.directory / name
        self._ckptr.save(path, _to_saveable(tree), force=True)
        self._ckptr.wait_until_finished()

    def save_latest(self, state_tree, step: int):
        self._save("latest", state_tree)
        if _is_coordinator():
            (self.directory / "latest_step.json").write_text(
                json.dumps({"step": int(step)}))

    def save_step(self, state_tree, step: int):
        self._save(f"step_{int(step):08d}", state_tree)

    def save_best(self, state_tree, score: float, step: int,
                  extra: Optional[Dict] = None):
        """`extra` records the selection criterion alongside the score
        (e.g. probe_weight + the raw composite when the score is a blended
        selection value) so a resume can detect an incommensurate
        criterion instead of comparing blended vs plain scores."""
        self._save("best", state_tree)
        if _is_coordinator():
            meta = {"score": float(score), "step": int(step)}
            if extra:
                meta.update({k: (float(v) if isinstance(v, (int, float))
                                 else v) for k, v in extra.items()})
            (self.directory / "best_score.json").write_text(json.dumps(meta))

    # ---------------------------------------------------------- restore ----
    def restore(self, name: str, target_tree, partial: bool = False):
        """Restore `name` into target_tree's structure. partial=True restores
        only the keys present in target_tree (e.g. params without the saved
        optimizer state — the artifact-consumer path)."""
        path = self.directory / name
        if not path.exists():
            return None
        if partial:
            with ocp.PyTreeCheckpointer() as ckptr:
                restored = ckptr.restore(path)

            missing = []

            def merge(target, src, prefix=""):
                """Rebuild the TARGET's container structure from the raw
                restore (orbax returns namedtuples as field-name dicts and
                tuples as lists — handing those back verbatim breaks optax,
                whose update() needs its NamedTuple states back)."""
                if isinstance(target, dict):
                    out = {}
                    for k, v in target.items():
                        if isinstance(src, dict) and k in src:
                            out[k] = merge(v, src[k], f"{prefix}{k}/")
                        else:
                            # torch load_state_dict(strict=False) semantics
                            # (base_trainer.py:112-127 fine-tune preload):
                            # keys absent from the checkpoint keep the
                            # target's (freshly initialized) value.
                            missing.append(prefix + k)
                            out[k] = v
                    return out
                if hasattr(target, "_fields"):       # NamedTuple (optax)
                    vals = []
                    for f in target._fields:
                        if isinstance(src, dict) and f in src:
                            vals.append(merge(getattr(target, f), src[f],
                                              f"{prefix}{f}/"))
                        else:
                            missing.append(prefix + f)
                            vals.append(getattr(target, f))
                    return type(target)(*vals)
                if isinstance(target, (list, tuple)):
                    seq = src if isinstance(src, (list, tuple)) else []
                    vals = []
                    for i, t in enumerate(target):
                        if i < len(seq):
                            vals.append(merge(t, seq[i], f"{prefix}{i}/"))
                        else:
                            missing.append(f"{prefix}{i}")
                            vals.append(t)
                    return (list(vals) if isinstance(target, list)
                            else tuple(vals))
                if target is None:
                    return None
                return src

            merged = merge(target_tree, restored)
            if missing:
                import warnings
                warnings.warn(
                    f"partial restore from {path}: {len(missing)} target "
                    f"key(s) absent from checkpoint kept their initialized "
                    f"values: {missing[:8]}"
                    + ("..." if len(missing) > 8 else ""))
            return merged
        return self._ckptr.restore(path, target=_to_saveable(target_tree))

    def latest_step(self) -> Optional[int]:
        path = self.directory / "latest_step.json"
        if not path.exists():
            return None
        return json.loads(path.read_text())["step"]

    def best_score(self) -> Optional[float]:
        path = self.directory / "best_score.json"
        if not path.exists():
            return None
        return json.loads(path.read_text())["score"]

    def best_meta(self) -> Optional[Dict]:
        """Full best_score.json record (score, step, selection criterion)."""
        path = self.directory / "best_score.json"
        if not path.exists():
            return None
        return json.loads(path.read_text())


def resume_latest(ckpt: Optional["CheckpointManager"], state,
                  fields=("params", "opt_state"), extra=None,
                  partial: bool = True):
    """Shared resume-from-'latest' used by every trainer (the reference's
    `-R` flag, base_trainer.py:129-158).

    Restores `step` plus the named TrainState `fields` (and any `extra`
    tree entries, e.g. best_score) into a copy of `state`. Returns
    (new_state, restored_dict), or (None, None) when there is nothing to
    resume. One implementation so resume semantics — partial tolerance of
    older checkpoint layouts, step dtype — stay uniform across trainers.
    """
    if not ckpt:
        return None, None
    tree = {f: getattr(state, f) for f in fields}
    tree["step"] = np.asarray(0)
    if extra:
        tree.update(extra)
    restored = ckpt.restore("latest", tree, partial=partial)
    if restored is None:
        return None, None
    import jax.numpy as jnp
    new_state = state.replace(step=jnp.asarray(restored["step"]),
                              **{f: restored[f] for f in fields})
    return new_state, restored


__all__.append("resume_latest")
