"""Validator: per-case Dice/IoU over a dataset split → validation_results.json.

Capability parity with the reference's ModelValidator
(script/validate_model.py:98-314): loads a checkpoint (ours, or a PyTorch
.pth for cross-framework parity checks), runs the model in eval mode,
thresholds at 0.5, computes per-case Dice and IoU with the reference's
formulas (eps=1e-8, denominator-only), and writes a field-compatible
``validation_results.json`` {timestamp, avg_dice, avg_iou, case_count,
case_results:[{case_id, dice, iou}]}.
"""

from __future__ import annotations

import datetime
import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from pcmseg_tpu.core.config import Config
from pcmseg_tpu.data.dataset import ProstateDataset
from pcmseg_tpu.data.loader import DataLoader
from pcmseg_tpu.models import UNet3D
from pcmseg_tpu.train.checkpoints import load_checkpoint
from pcmseg_tpu.train.steps import create_train_state, jit_eval_step, make_eval_step
from pcmseg_tpu.utils.artifacts import write_json
from pcmseg_tpu.utils.logging import get_logger


# fields that must match the checkpoint being loaded: architecture keys
# determine the param-tree structure (a mismatch fails deep inside Orbax
# with an opaque structure error); preprocessing keys determine the input
# distribution the weights were trained on.
_ARCH_KEYS = (
    "n_modalities",
    "n_classes",
    "base_features",
    "norm_layer",
    "group_norm_groups",
    "modalities",
    # not architecture, but state-tree structure: an EMA-trained
    # checkpoint contains an ema_params subtree the Orbax template must
    # expect (train/checkpoints.py)
    "ema_decay",
    # likewise: a --deep_supervision checkpoint carries ds{1..3} aux-head
    # params (models/unet3d.py) the restore template must include, even
    # though inference never runs them
    "deep_supervision",
)
_PREP_KEYS = ("normalize", "norm_percentiles", "target_size")


def adopt_checkpoint_config(
    config: Config, checkpoint_path: str, explicit: Sequence[str] = ()
) -> Config:
    """Reconcile a Config with the checkpoint about to be loaded.

    Orbax checkpoints carry the training config snapshot in ``meta.json``;
    adopt its architecture + preprocessing fields so a checkpoint trained
    with non-default ``base_features``/``norm_layer``/``normalize`` loads
    without the user re-specifying every flag. Keys named in ``explicit``
    (e.g. flags the user actually passed) win over the snapshot.

    For torch ``.pth`` checkpoints (reference-trained: NO normalization at
    train time, min-max at the reference's own predict time —
    script/predict.py:72-75) default ``normalize`` to ``minmax`` so serving
    matches the reference's inference distribution.
    """
    log = get_logger("pcmseg.validate")
    explicit_set = set(explicit)
    if checkpoint_path.endswith((".pth", ".pt")):
        # our own exports (run.py export) embed the training config
        # snapshot in the payload — a round-tripped .pth is as
        # self-describing as the Orbax dir it came from. Reference-trained
        # .pth files have no such key and fall through to the minmax
        # default below.
        snap = {}
        if os.path.exists(checkpoint_path):
            import torch

            payload = torch.load(
                checkpoint_path, map_location="cpu", weights_only=False
            )
            if isinstance(payload, dict):
                snap = payload.get("config") or {}
        if snap:
            config = _adopt_fields(config, snap, explicit_set, log)
        elif "normalize" not in explicit_set and config.normalize != "minmax":
            log.info(
                "torch checkpoint: defaulting normalize=%r -> 'minmax' to "
                "match the reference's own inference (pass --normalize to "
                "override)",
                config.normalize,
            )
            config = config.replace(normalize="minmax")
        return config

    meta_file = os.path.join(checkpoint_path, "meta.json")
    if not os.path.exists(meta_file):
        return config
    import json

    with open(meta_file) as f:
        snap = json.load(f).get("config") or {}
    return _adopt_fields(config, snap, explicit_set, log)


def _adopt_fields(config: Config, snap: dict, explicit_set: set, log) -> Config:
    updates = {}
    for k in _ARCH_KEYS + _PREP_KEYS:
        if k not in snap or k in explicit_set:
            continue
        v = snap[k]
        cur = getattr(config, k)
        if isinstance(cur, tuple):
            v = tuple(v)
        if v != cur:
            updates[k] = v
    if updates:
        log.info("adopting checkpoint config fields: %s", sorted(updates))
        config = config.replace(**updates)
    return config


def load_model_state(config: Config, checkpoint_path: str):
    """Build a state and load weights from an Orbax dir or a torch .pth."""
    model = UNet3D.from_config(config)
    d, h, w = config.target_size
    state = create_train_state(
        config, jax.random.key(config.seed), model, (1, d, h, w, config.n_modalities)
    )
    if checkpoint_path.endswith((".pth", ".pt")):
        import torch

        from pcmseg_tpu.train.checkpoints import (
            batch_stats_from_torch_state_dict,
            params_from_torch_state_dict,
        )

        sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
        params = params_from_torch_state_dict(sd, state.params)
        replaced = {"params": params}
        if state.batch_stats:
            replaced["batch_stats"] = batch_stats_from_torch_state_dict(
                sd, state.batch_stats
            )
        state = state.replace(**replaced)
    else:
        state, _ = load_checkpoint(checkpoint_path, state)
        if getattr(state, "ema_params", None) and getattr(
            config, "ema_eval", True
        ):
            # serve the averaged weights — they are what training's
            # validation monitored and what 'best' was selected on.
            # Swapping here propagates EMA to every consumer (Validator,
            # Predictor, fold ensembles, BN folding, torch export).
            state = state.replace(params=state.ema_params)
    return model, state


class Validator:
    """Evaluates a trained model over a dataset (or index subset).

    ``checkpoint_path`` may name several checkpoints (comma list / glob /
    list — same spec as the Predictor): the fold-ensemble's averaged
    probabilities are then scored instead of a single model's, which is
    how one measures whether serving the CV ensemble is worth its K×
    device cost.
    """

    def __init__(
        self,
        config: Config,
        checkpoint_path,
        dataset: Optional[ProstateDataset] = None,
        indices: Optional[Sequence[int]] = None,
        explicit: Sequence[str] = (),
    ):
        from pcmseg_tpu.infer.predict import expand_model_paths

        self._paths = expand_model_paths(checkpoint_path)
        checkpoint_path = self._paths[0]
        config = adopt_checkpoint_config(config, checkpoint_path, explicit)
        self.config = config
        self.log = get_logger("pcmseg.validate")
        self.dataset = dataset or ProstateDataset(
            data_dir=config.data_dir,
            data_type=config.data_type,
            modalities=config.modalities,
            missing_strategy=config.missing_strategy,
            target_size=config.target_size,
            normalize=config.normalize,
            norm_percentiles=config.norm_percentiles,
            cache_dir=config.cache_dir,
            is_training=False,
            n_classes=config.n_classes,
            coregister=config.coregister,
        )
        self.loader = DataLoader(
            self.dataset,
            batch_size=config.batch_size,
            shuffle=False,
            indices=indices,
        )
        self.model, self.state = load_model_state(config, checkpoint_path)
        self._ensemble = None
        if len(self._paths) > 1:
            from pcmseg_tpu.infer.predict import Predictor

            self._ensemble = Predictor(config, self._paths, explicit=explicit)
        # postprocessing (infer/postprocess.py) rescoring needs the masks
        # on the host even when surface metrics don't
        self._postprocess = (
            config.postprocess != "none" or config.min_component_voxels > 0
        )
        self._eval_step = jit_eval_step(
            make_eval_step(
                self.model, config,
                return_pred=config.surface_metrics or self._postprocess,
            )
        )

    def _host_rescore(self, masks: np.ndarray, labels) -> tuple:
        """Per-sample Dice/IoU from host uint8 masks (the reference's
        validate_model.py:24-95 formulas, eps 1e-8). Multi-class masks
        are integer label maps; per-sample scores are the mean over the
        foreground classes (per-class values ride along as the third
        element, else None)."""
        from pcmseg_tpu.ops.metrics import EPS

        n = masks.shape[0]
        k = int(self.config.n_classes)
        if k >= 2:
            p = masks.reshape(n, -1).astype(np.int32)
            t = np.asarray(labels).reshape(n, -1).astype(np.int32)
            dice_c = np.zeros((n, k - 1), np.float64)
            iou_c = np.zeros((n, k - 1), np.float64)
            for c in range(1, k):
                pc = (p == c).astype(np.float32)
                tc = (t == c).astype(np.float32)
                inter = (pc * tc).sum(axis=1)
                psum, tsum = pc.sum(axis=1), tc.sum(axis=1)
                dice_c[:, c - 1] = (2.0 * inter) / (psum + tsum + EPS)
                iou_c[:, c - 1] = inter / (psum + tsum - inter + EPS)
            return (
                dice_c.mean(axis=1).tolist(),
                iou_c.mean(axis=1).tolist(),
                dice_c.tolist(),
            )
        p = masks.astype(np.float32).reshape(n, -1)
        t = np.asarray(labels, np.float32).reshape(n, -1)
        inter = (p * t).sum(axis=1)
        psum, tsum = p.sum(axis=1), t.sum(axis=1)
        dice = (2.0 * inter) / (psum + tsum + EPS)
        iou = inter / (psum + tsum - inter + EPS)
        return dice.tolist(), iou.tolist(), None

    def _batch_scores(self, batch) -> tuple:
        """Per-sample (dice, iou, masks) at ``config.threshold``.

        Single model: the jitted eval step. Ensemble: the Predictor's
        fold-averaged probabilities, scored with the same per-sample
        formulas (steps.make_eval_step / reference validate_model.py:24-95).
        With ``config.postprocess`` active the masks are component-filtered
        and rescored on the host, so the filter's Dice effect is what gets
        reported. ``masks`` is the uint8 prediction (only materialized when
        ``surface_metrics`` asked for it, else None)."""
        multiclass = int(self.config.n_classes) >= 2
        if self._ensemble is None:
            m = self._eval_step(
                self.state, {"image": batch["image"], "label": batch["label"]}
            )
            masks = np.asarray(m["pred"]) if "pred" in m else None
            if not self._postprocess:
                return (
                    np.asarray(m["dice"]).tolist(),
                    np.asarray(m["iou"]).tolist(),
                    masks,
                    np.asarray(m["dice_class"]).tolist()
                    if "dice_class" in m else None,
                )
        else:
            probs = self._ensemble.predict_probs_batch(batch["image"])
            if multiclass:
                masks = np.argmax(probs, axis=-1).astype(np.uint8)[..., None]
            else:
                masks = (probs > self.config.threshold).astype(np.uint8)
        if self._postprocess:
            from pcmseg_tpu.infer.postprocess import postprocess_from_config

            masks = np.stack([
                postprocess_from_config(mk[..., 0], self.config)[..., None]
                for mk in masks
            ])
        dice, iou, dice_class = self._host_rescore(masks, batch["label"])
        if not self.config.surface_metrics:
            masks = None
        return dice, iou, masks, dice_class

    def _case_surface(self, mask, label, spacing) -> Dict:
        """Boundary metrics for one case; JSON-safe (inf -> None)."""
        from pcmseg_tpu.ops.surface import case_surface_metrics

        cfg = self.config
        m = case_surface_metrics(
            np.asarray(mask),
            np.asarray(label),
            spacing=spacing,
            percentile=cfg.hausdorff_percentile,
            tolerance=cfg.surface_dice_tolerance,
        )
        return {
            k: (float(v) if np.isfinite(v) else None) for k, v in m.items()
        }

    @staticmethod
    def _surface_averages(case_results: List[Dict]) -> Dict:
        """Means over the cases where the metric is defined (one-empty-mask
        cases carry null distances; surface_dice is always defined)."""
        out = {}
        for k in ("hd95", "assd", "surface_dice"):
            vals = [r[k] for r in case_results if r.get(k) is not None]
            out[f"avg_{k}"] = float(np.mean(vals)) if vals else None
        return out

    def validate(self, save: bool = True) -> Dict:
        cfg = self.config
        case_results: List[Dict] = []
        for batch in self.loader:
            dices, ious, masks, dice_class = self._batch_scores(batch)
            for i, (cid, dice, iou) in enumerate(
                zip(batch["case_id"], dices, ious)
            ):
                rec = {"case_id": cid, "dice": float(dice), "iou": float(iou)}
                if dice_class is not None:
                    # class c's Dice at key str(c) (foreground classes only)
                    rec["dice_per_class"] = {
                        str(c + 1): float(v)
                        for c, v in enumerate(dice_class[i])
                    }
                if masks is not None:
                    # unit spacing: this validator scores on the resampled
                    # target_size grid, so distances read in voxels
                    rec.update(
                        self._case_surface(
                            masks[i], batch["label"][i], (1.0, 1.0, 1.0)
                        )
                    )
                case_results.append(rec)

        if not case_results:
            raise RuntimeError("validation ran over zero cases")
        avg_dice = float(np.mean([r["dice"] for r in case_results]))
        avg_iou = float(np.mean([r["iou"] for r in case_results]))
        results = {
            "timestamp": datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
            "avg_dice": avg_dice,
            "avg_iou": avg_iou,
            "case_count": len(case_results),
            "case_results": case_results,
        }
        per = [
            r["dice_per_class"] for r in case_results if "dice_per_class" in r
        ]
        if per:
            results["avg_dice_per_class"] = {
                c: float(np.mean([p[c] for p in per])) for c in per[0]
            }
        if cfg.surface_metrics:
            results.update(self._surface_averages(case_results))
            results["surface_units"] = "voxel"
        self.log.info(
            "validation: avg dice %.4f avg iou %.4f over %d cases",
            avg_dice, avg_iou, len(case_results),
        )
        if save:
            write_json(
                os.path.join(self.config.save_dir, "validation_results.json"),
                results,
            )
        return results

    def validate_native(self, save: bool = True) -> Dict:
        """Per-case Dice/IoU at each label's NATIVE grid (beyond-reference).

        The reference (and :meth:`validate`, its parity twin) scores on
        volumes resampled to ``target_size`` — which blurs thin structures
        in BOTH prediction and ground truth and flatters the Dice. Here
        every modality is resampled onto the case's raw label grid, the
        sliding-window predictor runs at that native resolution (tiled +
        blended when the volume exceeds one window), and the mask is
        scored against the unresampled binarized label.
        """
        import numpy as np

        from pcmseg_tpu.data.io import read_volume
        from pcmseg_tpu.data.resample import normalize_intensity, resample_array
        from pcmseg_tpu.ops.metrics import dice_score, iou_score

        predictor = self._native_predictor()

        cfg = self.config
        k = int(cfg.n_classes) if hasattr(cfg, "n_classes") else 1
        case_results: List[Dict] = []
        for rec in self.dataset.case_list:
            label_vol = read_volume(rec.label_path)
            if k >= 2:
                label = np.clip(
                    np.rint(label_vol.data), 0, k - 1
                ).astype(np.float32)[..., None]
            else:
                label = (label_vol.data > 0).astype(np.float32)[..., None]
            channels = []
            for m in cfg.modalities:
                p = rec.modality_files.get(m)
                if p is None:
                    channels.append(np.zeros(label_vol.shape, np.float32))
                    continue
                data = read_volume(p).data
                if data.shape != label_vol.shape:
                    data = resample_array(data, label_vol.shape, mode="linear")
                channels.append(
                    normalize_intensity(
                        data, cfg.normalize, cfg.norm_percentiles
                    )
                )
            image = np.stack(channels, axis=-1).astype(np.float32)
            # device-side threshold/argmax (uint8 D2H is 4x smaller than
            # probs)
            mask = predictor.predict_mask(image)[..., None].astype(np.float32)
            if k >= 2:
                dice, iou, dice_c = self._host_rescore(mask[None], label[None])
                case_rec = {
                    "case_id": rec.case_id,
                    "dice": float(dice[0]),
                    "iou": float(iou[0]),
                    "dice_per_class": {
                        str(c + 1): float(v) for c, v in enumerate(dice_c[0])
                    },
                    "shape": list(label_vol.shape),
                }
                # boundary metrics below score the foreground UNION
                # (mask>0 vs label>0) — per-class surfaces would need a
                # per-class distance transform per case
                mask = (mask > 0).astype(np.float32)
                label_s = (label > 0).astype(np.float32)
            else:
                case_rec = {
                    "case_id": rec.case_id,
                    "dice": float(dice_score(mask, label)),
                    "iou": float(iou_score(mask, label)),
                    "shape": list(label_vol.shape),
                }
                label_s = label
            if cfg.surface_metrics:
                # Volume spacing is (sx,sy,sz); data axes are (z,y,x) —
                # reverse so distances come out in true millimetres
                case_rec.update(
                    self._case_surface(mask, label_s, label_vol.spacing[::-1])
                )
            case_results.append(case_rec)

        if not case_results:
            raise RuntimeError("native validation ran over zero cases")
        avg_dice = float(np.mean([r["dice"] for r in case_results]))
        avg_iou = float(np.mean([r["iou"] for r in case_results]))
        results = {
            "timestamp": datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
            "resolution": "native",
            "avg_dice": avg_dice,
            "avg_iou": avg_iou,
            "case_count": len(case_results),
            "case_results": case_results,
        }
        if cfg.surface_metrics:
            results.update(self._surface_averages(case_results))
            results["surface_units"] = "mm"
        self.log.info(
            "native validation: avg dice %.4f avg iou %.4f over %d cases",
            avg_dice, avg_iou, len(case_results),
        )
        if save:
            write_json(
                os.path.join(
                    self.config.save_dir, "validation_results_native.json"
                ),
                results,
            )
        return results

    def _native_predictor(self):
        """A Predictor sharing this Validator's already-loaded model/state
        (no second checkpoint load), built through the REAL constructor so
        it keeps every serving feature (BN folding, TTA, spatial sharding,
        tiling) in sync with the predict path. Under ensemble validation
        the fold-ensemble Predictor (already loaded) is reused directly."""
        if self._ensemble is not None:
            return self._ensemble
        from pcmseg_tpu.infer.predict import Predictor

        return Predictor(
            self.config.replace(sliding_window=False),
            preloaded=(self.model, self.state),
        )
