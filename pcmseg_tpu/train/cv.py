"""K-fold cross-validation trainer.

Capability parity with the reference's CV paths (train_bph_cv.py:46-489,
train_bph_optimized.py:78-475): deterministic KFold (seed 42, shuffle) over
the *filtered* case list, a fresh model/optimizer/scheduler per fold,
per-fold best checkpoints (``best_fold_{k}``), per-fold history JSON
(``fold_{k}_history.json``), and an aggregate ``cv_results.json`` with
mean/std — field-compatible with train_bph_optimized.py:437-458.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from pcmseg_tpu.core.config import Config
from pcmseg_tpu.data.dataset import ProstateDataset
from pcmseg_tpu.data.kfold import kfold_indices
from pcmseg_tpu.train.trainer import Trainer
from pcmseg_tpu.utils.artifacts import write_json
from pcmseg_tpu.utils.logging import get_logger


class CrossValidationTrainer:
    """Runs ``config.n_splits`` folds, each a fresh :class:`Trainer`."""

    def __init__(self, config: Config, dataset: Optional[ProstateDataset] = None):
        self.config = config
        self.log = get_logger("pcmseg.cv")
        self.dataset = dataset or ProstateDataset(
            data_dir=config.data_dir,
            data_type=config.data_type,
            modalities=config.modalities,
            missing_strategy=config.missing_strategy,
            target_size=config.target_size,
            normalize=config.normalize,
            norm_percentiles=config.norm_percentiles,
            cache_dir=config.cache_dir,
            n_classes=config.n_classes,
            coregister=config.coregister,
        )
        self.splits = kfold_indices(
            len(self.dataset), n_splits=config.n_splits, seed=config.seed
        )
        self.fold_results: List[Dict] = []

    def train_fold(self, fold_idx: int) -> Dict:
        tr_idx, va_idx = self.splits[fold_idx]
        self.log.info(
            "fold %d/%d: %d train / %d val cases",
            fold_idx + 1, len(self.splits), len(tr_idx), len(va_idx),
        )
        trainer = Trainer(
            self.config,
            dataset=self.dataset,
            train_indices=tr_idx.tolist(),
            val_indices=va_idx.tolist(),
            tag=f"fold_{fold_idx}",
        )
        history = trainer.train()
        best_val_loss = (
            float(np.min(history["val_loss"]))
            if history["val_loss"]
            else float("inf")
        )

        write_json(
            os.path.join(self.config.save_dir, f"fold_{fold_idx}_history.json"),
            history,
        )
        result = {
            "fold": fold_idx + 1,
            "best_val_loss": best_val_loss,
            "epochs_trained": len(history["train_loss"]),
        }
        self.fold_results.append(result)
        return result

    def _completed_fold_result(self, fold_idx: int) -> Optional[Dict]:
        """A finished fold's result, reconstructed from its history JSON.

        ``fold_{k}_history.json`` is written only after the fold's training
        loop returns (train_fold), so its presence marks the fold COMPLETE —
        the cross-fold resume marker. A fold killed mid-training has
        checkpoints but no history file; re-running it under
        ``config.resume`` makes its Trainer pick up from ``latest_fold_{k}``
        (trainer.py _try_resume), landing in the right epoch.
        """
        import json

        path = os.path.join(
            self.config.save_dir, f"fold_{fold_idx}_history.json"
        )
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                history = json.load(f)
        except (OSError, ValueError):
            return None  # unreadable/truncated marker -> re-run the fold
        if not history.get("train_loss"):
            return None
        # the fold's loop returned, but under which num_epochs? If the
        # current config asks for MORE epochs than the file records and
        # early stopping is off, the user extended the run — re-enter the
        # fold (its Trainer resumes from latest_fold_{k} and trains the
        # extra epochs). With early stopping on, a short history means the
        # fold stopped itself: complete.
        if (
            len(history["train_loss"]) < self.config.num_epochs
            and not self.config.early_stopping
        ):
            return None
        return {
            "fold": fold_idx + 1,
            "best_val_loss": (
                float(np.min(history["val_loss"]))
                if history.get("val_loss")
                else float("inf")
            ),
            "epochs_trained": len(history["train_loss"]),
        }

    def train(self) -> Dict:
        for k in range(len(self.splits)):
            if self.config.resume:
                done = self._completed_fold_result(k)
                if done is not None:
                    self.log.info(
                        "fold %d/%d already complete (%d epochs); skipping",
                        k + 1, len(self.splits), done["epochs_trained"],
                    )
                    self.fold_results.append(done)
                    continue
            self.train_fold(k)
        results = self.save_results()
        self.print_summary()
        return results

    def save_results(self) -> Dict:
        losses = [r["best_val_loss"] for r in self.fold_results]
        results = {
            "config": self.config.to_dict(),
            "fold_results": self.fold_results,
            "summary": {
                "mean_val_loss": float(np.mean(losses)),
                # torch .std() is the sample std (ddof=1), matching
                # train_bph_optimized.py:450
                "std_val_loss": float(np.std(losses, ddof=1))
                if len(losses) > 1
                else 0.0,
                "total_folds": len(self.fold_results),
            },
        }
        path = write_json(
            os.path.join(self.config.save_dir, "cv_results.json"), results
        )
        self.log.info("cross-validation results written to %s", path)
        return results

    def print_summary(self) -> None:
        for r in self.fold_results:
            self.log.info(
                "fold %d: best val loss %.4f (%d epochs)",
                r["fold"], r["best_val_loss"], r["epochs_trained"],
            )
        losses = [r["best_val_loss"] for r in self.fold_results]
        if losses:
            self.log.info(
                "mean val loss: %.4f +- %.4f",
                float(np.mean(losses)),
                float(np.std(losses, ddof=1)) if len(losses) > 1 else 0.0,
            )
