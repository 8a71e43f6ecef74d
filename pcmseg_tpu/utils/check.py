"""Project health checker → project_check_report.json.

Capability parity with the reference's test/check_project.py (environment
report: dependency probe, checkpoint inventory, data-tree validation, JSON
report, exit code), anchored at an explicit root instead of the checker's
own directory (fixes SURVEY.md §8.12), and reporting TPU topology instead
of CUDA.
"""

from __future__ import annotations

import importlib
import os
from typing import Dict, List, Optional

from pcmseg_tpu.core.config import DEFAULT_MODALITIES
from pcmseg_tpu.data.dataset import LABEL_DIR
from pcmseg_tpu.utils.artifacts import write_json

REQUIRED_PACKAGES = ["jax", "flax", "optax", "numpy", "orbax.checkpoint"]
OPTIONAL_PACKAGES = ["sklearn", "torch", "chex", "einops"]


def check_dependencies() -> Dict:
    out = {"required": {}, "optional": {}, "ok": True}
    for name, bucket in [(p, "required") for p in REQUIRED_PACKAGES] + [
        (p, "optional") for p in OPTIONAL_PACKAGES
    ]:
        try:
            mod = importlib.import_module(name)
            out[bucket][name] = getattr(mod, "__version__", "unknown")
        except ImportError:
            out[bucket][name] = None
            if bucket == "required":
                out["ok"] = False
    return out


def check_devices() -> Dict:
    try:
        import jax

        devices = jax.devices()
        return {
            "ok": True,
            "backend": jax.default_backend(),
            "device_count": len(devices),
            "devices": [str(d) for d in devices],
        }
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "error": str(e)}


def check_data_directory(
    data_dir: str, data_types: Optional[List[str]] = None
) -> Dict:
    """Validate the BPH-PCA tree layout + per-modality file counts."""
    data_types = data_types or ["BPH", "PCA"]
    report: Dict = {"data_dir": os.path.abspath(data_dir), "types": {}, "ok": True}
    if not os.path.isdir(data_dir):
        report["ok"] = False
        report["error"] = "data_dir does not exist"
        return report
    for dt in data_types:
        entry: Dict = {"modalities": {}, "labels": 0}
        for m in DEFAULT_MODALITIES:
            d = os.path.join(data_dir, "BPH-PCA", dt, m)
            entry["modalities"][m] = (
                len([f for f in os.listdir(d) if not f.startswith(".")])
                if os.path.isdir(d)
                else None
            )
        lab = os.path.join(data_dir, "BPH-PCA", LABEL_DIR, dt)
        entry["labels"] = (
            len([f for f in os.listdir(lab) if not f.startswith(".")])
            if os.path.isdir(lab)
            else None
        )
        entry["present"] = entry["labels"] is not None and any(
            v for v in entry["modalities"].values() if v
        )
        report["types"][dt] = entry
    if not any(t["present"] for t in report["types"].values()):
        report["ok"] = False
    return report


def check_checkpoints(save_dir: str) -> Dict:
    out: Dict = {"save_dir": os.path.abspath(save_dir), "checkpoints": []}
    if os.path.isdir(save_dir):
        for name in sorted(os.listdir(save_dir)):
            if os.path.isdir(os.path.join(save_dir, name, "state")):
                out["checkpoints"].append(name)
    out["count"] = len(out["checkpoints"])
    return out


def check_package_files(root: str) -> Dict:
    required = [
        "pcmseg_tpu/__init__.py",
        "pcmseg_tpu/models/unet3d.py",
        "pcmseg_tpu/ops/losses.py",
        "pcmseg_tpu/data/dataset.py",
        "pcmseg_tpu/train/trainer.py",
        "pcmseg_tpu/infer/predict.py",
        "run.py",
        "bench.py",
    ]
    out = {"root": os.path.abspath(root), "missing": [], "ok": True}
    for rel in required:
        if not os.path.exists(os.path.join(root, rel)):
            out["missing"].append(rel)
    out["ok"] = not out["missing"]
    return out


def generate_report(
    data_dir: str = "data",
    save_dir: str = "checkpoints",
    root: Optional[str] = None,
    output_path: Optional[str] = "project_check_report.json",
) -> Dict:
    root = root or os.getcwd()
    report = {
        "dependencies": check_dependencies(),
        "devices": check_devices(),
        "data": check_data_directory(data_dir),
        "checkpoints": check_checkpoints(save_dir),
        "files": check_package_files(root),
    }
    report["ok"] = bool(
        report["dependencies"]["ok"]
        and report["devices"]["ok"]
        and report["files"]["ok"]
    )
    if output_path:
        write_json(output_path, report)
    return report
